"""True HiDPI: `Scene.scaled(s)` must be pixel-identical to compiling a
natively-scaled layout (commands are affine in geometry), strictly
sharper than the old Lanczos image upscale, and leave logical-unit layout
untouched. Reference: README.md:13 ("HiDPI/4K aware — all layouts scale
with the display scale factor"), src/screenshot_mode.rs:38."""

from __future__ import annotations

import numpy as np
import pytest

from whisper_git_tpu.render.rasterizer import render_scene
from whisper_git_tpu.ui import rect, stack, text
from whisper_git_tpu.ui.theme import DARK


@pytest.fixture(scope="module")
def renderer():
    from whisper_git_tpu.render.renderer import get_renderer

    return get_renderer()


def _tree(font_size: float, pad: float, h: float):
    return stack(
        rect(text("Hello HiDPI glyphs 0123", font_size=font_size,
                  color=DARK.text),
             fill=DARK.surface, radius=pad / 2,
             padding=(pad, pad, pad, pad), width="fill", height=h),
        width="fill", height="fill", fill=DARK.background)


def _render(renderer, tree, w, h, scale=1.0):
    root = renderer.layout(tree, (w, h))
    scene = renderer.compile(root, (w, h), DARK.background)
    if scale != 1.0:
        scene = scene.scaled(scale)
    return np.asarray(render_scene(scene, renderer.font_tex_device(),
                                   renderer.image_atlas_device()))


def test_scaled_matches_native_double_layout(renderer):
    """scale=2 of a logical layout == rendering the layout with every
    logical quantity doubled — the strongest possible crispness witness
    (both sample the SDF atlas at physical resolution)."""
    img2 = _render(renderer, _tree(13, 8, 40), 200, 50, scale=2.0)
    img_native = _render(renderer, _tree(26, 16, 80), 400, 100)
    assert img2.shape == (100, 400, 4)
    assert np.array_equal(img2, img_native)


def test_scaled_sharper_than_lanczos(renderer):
    """Glyph edges must be sharper than the pre-HiDPI Lanczos upscale:
    the steepest luminance step across glyph boundaries is higher when
    the SDF is sampled at physical resolution."""
    from whisper_git_tpu.ops.image import resize_lanczos

    img1 = _render(renderer, _tree(13, 8, 40), 200, 50)
    up = np.asarray(resize_lanczos(img1, 100, 400))
    img2 = _render(renderer, _tree(13, 8, 40), 200, 50, scale=2.0)

    def max_grad(img):
        g = img[..., :3].astype(np.float64).mean(-1)
        return float(np.abs(np.diff(g, axis=1)).max())

    assert max_grad(img2) > max_grad(up) * 1.2


def test_fractional_scale(renderer):
    img = _render(renderer, _tree(13, 8, 40), 200, 50, scale=1.5)
    assert img.shape == (75, 300, 4)


def test_screenshot_mode_scale_produces_physical_size(tmp_path, temp_repo):
    from PIL import Image

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.host import screenshot_mode

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    out = str(tmp_path / "shot2x.png")
    screenshot_mode.run(out, 640, 400, 2.0, app)
    img = np.asarray(Image.open(out))
    assert img.shape == (400, 640, 4)
    tab.stop_workers()
