"""Device-resident scroll windows must be pixel-exact vs inline splicing.

The rasterizer keeps a scroll window's commands cached on the device in
window-relative coordinates and applies the scroll shift on-device
(rasterizer pack_scene/_unpack_window); the inline path bakes final
coordinates on the host. Both must produce identical frames at every
scroll offset — integer, fractional, and tile-boundary-straddling —
including paint order across the window/chrome interleave (a zebra row
background spanning a tile boundary vs. the bezier piece just below it
is the regression case the ordering sort exists for).
"""

import numpy as np
import pytest

import whisper_git_tpu.render.scene as S
from whisper_git_tpu.render import rasterizer as R
from whisper_git_tpu.render.renderer import get_renderer
from whisper_git_tpu.ui.theme import DARK

VIEWPORT = (640, 480)


@pytest.fixture(scope="module", autouse=True)
def _frame_path_only():
    """This suite proves WINDOW SPLICING is bit-exact vs inline
    baking — compare within ONE pipeline (the frame path). The compose
    path's f16 layer cache is allowed ±1 u8 by design and has its own
    exactness suite (test_compose)."""
    import os

    old = os.environ.get("WGIT_FRAME_COMPOSE")
    os.environ["WGIT_FRAME_COMPOSE"] = "0"
    yield
    if old is None:
        os.environ.pop("WGIT_FRAME_COMPOSE", None)
    else:
        os.environ["WGIT_FRAME_COMPOSE"] = old


@pytest.fixture(scope="module")
def app_and_renderer(tmp_path_factory):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.tools.dump_bundles import make_fixture_repo

    repo = make_fixture_repo(str(tmp_path_factory.mktemp("winres")))
    tab = RepoTab.open(repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    return app, tab, get_renderer()


def _render(app, tab, r, off: float, windows_on: bool) -> np.ndarray:
    tab.history_scroll = float(off)
    tree = app.build((float(VIEWPORT[0]), float(VIEWPORT[1])))
    root = r.layout(tree, VIEWPORT)
    if not windows_on:
        orig = S.SceneCompiler._splice_scroll_window

        def patched(self, node, acc, clip, _orig=orig):
            keep = self._frame_windows
            self._frame_windows = None
            try:
                _orig(self, node, acc, clip)
            finally:
                self._frame_windows = keep

        S.SceneCompiler._splice_scroll_window = patched
        try:
            scene = r.compile(root, VIEWPORT, DARK.background)
        finally:
            S.SceneCompiler._splice_scroll_window = orig
    else:
        scene = r.compile(root, VIEWPORT, DARK.background)
    font = r.font_tex_device()
    return np.asarray(R.render_scene(scene, font, r.image_atlas_device()))


@pytest.mark.parametrize("off", [0.0, 13.0, 63.9, 64.0, 100.3, 128.5])
def test_window_path_pixel_exact(app_and_renderer, off):
    app, tab, r = app_and_renderer
    a = _render(app, tab, r, off, True)
    b = _render(app, tab, r, off, False)
    assert int(np.abs(a.astype(int) - b.astype(int)).max()) == 0


def test_window_path_actually_engaged(app_and_renderer):
    """Guard: the fixture really exercises the device-resident path (a
    scroll window is recorded, not inline-spliced)."""
    app, tab, r = app_and_renderer
    tab.history_scroll = 30.0
    tree = app.build((float(VIEWPORT[0]), float(VIEWPORT[1])))
    root = r.layout(tree, VIEWPORT)
    scene = r.compile(root, VIEWPORT, DARK.background)
    assert scene.windows, "history scroll window was not recorded"
    assert scene.windows[0].comp.glyphs.shape[0] > 0


def test_merged_window_bins_sorted_and_based():
    """_merged_window_bins output is ascending per tile (submission order)
    with -1 padding at the end, offset by the concat-table base."""
    wb = {
        "row0": 0,
        "all": np.array([[[3, 5, -1]], [[1, 2, 7]]], np.int32),
        "starts": np.array([[[3, -1, -1]], [[2, 7, -1]]], np.int32),
    }
    # Boxes spanning both tile rows so the exact row filter keeps all.
    boxes = np.array([[0, 0, 10, 127]] * 8, np.float32)
    m = R._merged_window_bins(wb, 0.0, 2, 1, base=100, boxes=boxes)
    for t in range(m.shape[0]):
        vals = [x for x in m[t] if x >= 0]
        assert vals == sorted(vals)
        assert all(x >= 100 for x in vals)
        assert list(m[t][len(vals):]) == [-1] * (m.shape[1] - len(vals))
