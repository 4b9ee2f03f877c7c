"""Real-TPU hardware tier — `WGIT_TPU_TESTS=1 pytest -m tpu tests/test_tpu_hw.py`.

CPU CI runs the Pallas kernel only in interpret mode and renders the
pixel goldens on the CPU backend; a Mosaic-level regression (alignment,
VMEM budget, bf16 MXU behavior) would pass the entire local suite and
only surface when someone runs the app on hardware. This tier closes
that hole: it exercises every TPU-only code path on the actual chip —
the compiled Mosaic kernel vs the XLA scan path, a pixel-golden scene,
the steady-state frame-cache/compose sequence, the extended (fallback-
bank) font texture under VMEM residency, and a full screenshot frame.

Budget note: the process's FIRST device→host readback pays the tunnel's
one-time link init (~2–6 min, docs/render-engine.md "First-readback
stall"); the module fixture absorbs it once up front.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_renderer():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend (got {jax.default_backend()})")
    from whisper_git_tpu.render.renderer import (
        enable_persistent_compile_cache,
        get_renderer,
        wait_link_warmup,
    )

    enable_persistent_compile_cache()
    r = get_renderer()
    wait_link_warmup()  # absorb the one-time link init before any timing
    return r


def _steady_scene(renderer, off: float, w=384, h=256):
    from whisper_git_tpu.tools.fixtures import steady_window_scene

    return steady_window_scene(renderer, off, (w, h))


def _clear_device_caches():
    from whisper_git_tpu.render import compose as C, frame as F

    C.clear_caches()
    F.clear_caches()


def test_pallas_kernel_matches_xla_on_hw(tpu_renderer, monkeypatch):
    """The compiled Mosaic kernel (not interpret mode) vs the XLA scan
    path, same device, same scene: ≤1 u8. This is the assertion
    tests/test_pallas_raster.py can only approximate in interpret mode."""
    from whisper_git_tpu.render import rasterizer as R

    scene = _steady_scene(tpu_renderer, 16.0)
    monkeypatch.setenv("WGIT_FRAME_CACHE", "0")  # single-shot packed path
    monkeypatch.setenv("WGIT_PALLAS", "1")
    _clear_device_caches()
    got_pallas = np.asarray(R.render_scene_device(
        scene, tpu_renderer.font_tex_device(),
        tpu_renderer.image_atlas_device()))
    monkeypatch.setenv("WGIT_PALLAS", "0")
    got_xla = np.asarray(R.render_scene_device(
        scene, tpu_renderer.font_tex_device(),
        tpu_renderer.image_atlas_device()))
    diff = np.abs(got_pallas.astype(np.int16) - got_xla.astype(np.int16))
    assert diff.max() <= 1, f"pallas vs xla on hw: {diff.max()} u8"


def test_pixel_golden_on_hw(tpu_renderer):
    """One checked-in golden scene rendered on the chip. The goldens are
    CPU-rendered; hardware bf16 MXU rounding differs slightly from the
    CPU emulation, so the gate is TOLERANCE+2 — still far below any
    real shader/layout regression (test_pixel_golden's sensitivity test
    shows a 1 px shift exceeds TOLERANCE many times over)."""
    import os

    from PIL import Image

    from whisper_git_tpu.tools.goldens import (
        TOLERANCE,
        golden_dir,
        render_scene_image,
    )

    got = render_scene_image("chrome")
    want = np.asarray(Image.open(os.path.join(golden_dir(), "chrome.png")))
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= TOLERANCE + 2, \
        f"hw render vs cpu golden: {diff.max()} u8"


def test_steady_state_sequence_on_hw(tpu_renderer, monkeypatch):
    """Three consecutive scroll frames through the production compose
    path vs the single-shot packed path, on hardware: ≤1 u8 each (the
    bound the CPU suite asserts, now certified where the Pallas blocks
    kernel actually runs)."""
    from whisper_git_tpu.render import rasterizer as R

    monkeypatch.delenv("WGIT_FRAME_CACHE", raising=False)
    monkeypatch.delenv("WGIT_FRAME_COMPOSE", raising=False)
    _clear_device_caches()
    for off in (0.0, 16.0, 32.0):
        scene = _steady_scene(tpu_renderer, off)
        assert scene.windows, "fixture recorded no scroll window"
        got = np.asarray(R.render_scene_device(
            scene, tpu_renderer.font_tex_device(),
            tpu_renderer.image_atlas_device()))
        monkeypatch.setenv("WGIT_FRAME_CACHE", "0")
        ref = np.asarray(R.render_scene_device(
            scene, tpu_renderer.font_tex_device(),
            tpu_renderer.image_atlas_device()))
        monkeypatch.delenv("WGIT_FRAME_CACHE", raising=False)
        diff = np.abs(ref.astype(np.int16) - got.astype(np.int16))
        assert diff.max() <= 1, (off, diff.max())


def test_fallback_bank_under_vmem_on_hw(tpu_renderer):
    """The EXTENDED font texture (resident + fallback bank rows) through
    the compiled Pallas kernel: the bank adds ~1.6 MB bf16 of VMEM-
    resident cells; a budget overflow would fail Mosaic compilation
    here and nowhere in CPU CI."""
    from whisper_git_tpu.ui.el import El

    bank = tpu_renderer.fallback_bank
    bank.ensure([ord(c) for c in "שלום∮┌"])
    assert bank.used
    tree = El("stack", children=[
        El("text", text="fallback שלום ∮ ┌ on hw", font_size=16.0,
           color=(1.0, 1.0, 1.0, 1.0))])
    img = np.asarray(tpu_renderer.render(tree, (384, 64)))
    assert (img[..., :3].max(axis=-1) > 128).sum() > 50


def test_cjk_fixture_chain_on_hw(tpu_renderer, tmp_path, monkeypatch):
    """The WGIT_FALLBACK_FONTS → cmap → rasterize → bank path with REAL
    CJK codepoints, sampled by the compiled Mosaic kernel (the fixture
    TTF stands in for a system CJK font, which CI lacks)."""
    import sys

    sys.path.insert(0, "tests")
    from test_fallback import _build_cjk_fixture_font

    import whisper_git_tpu.render.fallback as fb

    font_path = str(tmp_path / "cjk-fixture.ttf")
    _build_cjk_fixture_font(font_path)
    monkeypatch.setenv("WGIT_FALLBACK_FONTS", font_path)
    bank = fb.FallbackBank()
    bank.set_layout(v_base=tpu_renderer.font_tex.shape[0],
                    primary_ascent=tpu_renderer.regular.ascent)
    assert bank.ensure([0x4E2D, 0x6587])
    old = tpu_renderer.fallback_bank
    try:
        tpu_renderer.fallback_bank = bank
        tpu_renderer.regular.attach_fallback(bank)
        tpu_renderer._font_tex_dev = None
        from whisper_git_tpu.ui.el import El
        tree = El("stack", children=[
            El("text", text="中文 on hw", font_size=18.0,
               color=(1.0, 1.0, 1.0, 1.0))])
        img = np.asarray(tpu_renderer.render(tree, (256, 64)))
        assert (img[..., :3].max(axis=-1) > 128).sum() > 80
    finally:
        tpu_renderer.fallback_bank = old
        tpu_renderer.regular.attach_fallback(old)
        tpu_renderer._font_tex_dev = None


def test_screenshot_frame_on_hw(tpu_renderer, temp_repo):
    """A full app frame (repo open → state refresh → build → layout →
    compile → TPU raster → readback) — the screenshot surface end to
    end on hardware."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.host.screenshot_mode import render_frame

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    img = np.asarray(render_frame(app, 1280, 800))
    assert img.shape == (800, 1280, 4)
    # Real content rendered: background is not the only color.
    assert len(np.unique(img[..., 0])) > 8
    for tb in app.tabs:
        tb.stop_workers()


def test_compose_kernel_active_and_matches_xla_blend_on_hw(
        tpu_renderer, monkeypatch):
    """The Mosaic compose kernel (render/pallas_compose.py) must be the
    live blend on hardware, and its COMPILED output must match the XLA
    blend chain within 1 u8 on the same chip — the interpret-mode CPU
    gate (test_compose.py) cannot see Mosaic lowering bugs."""
    from whisper_git_tpu.render import compose as C
    from whisper_git_tpu.render import rasterizer as R

    monkeypatch.delenv("WGIT_COMPOSE_KERNEL", raising=False)
    monkeypatch.delenv("WGIT_FRAME_COMPOSE", raising=False)
    assert C._kernel_mode(), \
        "Mosaic compose kernel not active on the TPU backend"
    scene = _steady_scene(tpu_renderer, 16.0)
    _clear_device_caches()
    kern = C.render_frame_composed(scene, tpu_renderer.font_tex_device(),
                                   tpu_renderer.image_atlas_device())
    assert kern is not None
    monkeypatch.setenv("WGIT_COMPOSE_KERNEL", "0")
    _clear_device_caches()
    xla = C.render_frame_composed(scene, tpu_renderer.font_tex_device(),
                                  tpu_renderer.image_atlas_device())
    assert xla is not None
    diff = np.abs(np.asarray(kern).astype(np.int16)
                  - np.asarray(xla).astype(np.int16))
    assert diff.max() <= 1, f"kernel vs XLA on hw: {diff.max()} u8"


def test_compose_kernel_inline_volatile_off_column_zero_on_hw(
        tpu_renderer, monkeypatch):
    """COMPILED Mosaic regression gate for the r4 advisor finding: an
    inline volatile shape whose tile-column range starts at c0 >= 1
    (the right-edge scrollbar-thumb case) must land at its true
    position — the shape tables are x-translated to the tail's
    sub-grid at pack time and the kernel evaluates them against
    sub-grid-local pixel x (render/pallas_compose.py dyni branch).
    Mirror of the interpret-mode gate in test_compose.py."""
    from whisper_git_tpu.render import compose as C
    from whisper_git_tpu.ui import rect, row, spacer, stack
    from whisper_git_tpu.ui.theme import DARK

    monkeypatch.delenv("WGIT_COMPOSE_KERNEL", raising=False)
    assert C._kernel_mode()
    width, height = 512, 128
    ui = stack(
        rect(width="fill", height="fill", fill=DARK.background),
        row(spacer(154),
            *[el for _ in range(3) for el in
              (rect(width=12, height=12, radius=6,
                    fill=(0.9, 0.6, 0.2, 0.9), volatile=True),
               spacer(116))],
            width="fill", height=60),
        width="fill", height="fill")

    def render():
        _clear_device_caches()
        root = tpu_renderer.layout(ui, (width, height))
        scene = tpu_renderer.compile(root, (width, height),
                                     DARK.background)
        prepared = C.prepare_compose_dispatch(
            scene, tpu_renderer.font_tex_device(),
            tpu_renderer.image_atlas_device())
        assert prepared is not None
        dyn_meta = prepared[1]["meta"][1]
        cols = [(m[2], m[3]) for m in dyn_meta if m[3] > m[2]]
        assert any(c0 >= 1 for c0, _ in cols), cols
        out = C.render_frame_composed(scene,
                                      tpu_renderer.font_tex_device(),
                                      tpu_renderer.image_atlas_device())
        assert out is not None
        return np.asarray(out)

    kern = render()
    monkeypatch.setenv("WGIT_COMPOSE_KERNEL", "0")
    xla = render()
    diff = np.abs(kern.astype(np.int16) - xla.astype(np.int16))
    assert diff.max() <= 1, \
        f"inline volatile at column >= 1 on hw: {diff.max()} u8"
