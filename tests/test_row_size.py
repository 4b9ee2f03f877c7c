"""Row Size setting (reference README.md:117 "Row Size: Normal or Large
(1.5×)"): toggling must visibly change history row pitch, graph geometry,
sidebar pitch, and hit-testing — not just flip a config bit."""

from __future__ import annotations

import numpy as np

from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.ops.lanes import ROW_HEIGHT


def _app(temp_repo, git, large: bool, n_commits: int = 4):
    for i in range(n_commits):
        git(temp_repo, "commit", "--allow-empty", "-m", f"c{i}")
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    app.config.row_size_large = large
    app.build((900.0, 600.0))  # sync pass applies the scale
    return app, tab


def test_large_rows_scale_graph_pitch(temp_repo, git):
    app, tab = _app(temp_repo, git, large=True)
    assert tab.row_scale == 1.5
    assert tab.graph_layout.row_heights[0] == ROW_HEIGHT * 1.5
    # Total height scales, so scrollbars/hit tests follow.
    app2, tab2 = _app(temp_repo, git, large=False, n_commits=0)
    assert tab2.graph_layout.row_heights[0] == ROW_HEIGHT
    assert (tab.graph_layout.total_height
            > tab2.graph_layout.total_height * 1.4)
    for t in (tab, tab2):
        t.stop_workers()


def test_toggle_row_size_rebuilds_layout(temp_repo, git):
    app, tab = _app(temp_repo, git, large=False)
    v0 = tab.layout_version
    app._act_toggle_row_size(None, 0, 0)
    app.build((900.0, 600.0))
    assert tab.row_scale == 1.5
    assert tab.layout_version > v0
    assert tab.graph_layout.row_heights[0] == ROW_HEIGHT * 1.5
    tab.stop_workers()


def test_large_rows_change_pixels(temp_repo, git):
    """The rendered history view must differ between Normal and Large —
    the reference shipped this as a visible setting, not a dead toggle."""
    from whisper_git_tpu.host.screenshot_mode import render_frame

    app_l, tab_l = _app(temp_repo, git, large=True)
    img_l = np.asarray(render_frame(app_l, 640, 400))
    app_n, tab_n = _app(temp_repo, git, large=False)
    img_n = np.asarray(render_frame(app_n, 640, 400))
    assert not np.array_equal(img_l, img_n)
    for t in (tab_l, tab_n):
        t.stop_workers()


def test_sidebar_item_h_scales(temp_repo, git):
    from whisper_git_tpu.app.views.sidebar import ITEM_H, item_h

    app, tab = _app(temp_repo, git, large=True)
    assert item_h(tab) == ITEM_H * 1.5
    tab.stop_workers()
