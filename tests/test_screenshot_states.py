"""Screenshot-state fixtures render through the real pipeline (the
reference's GPU screenshot tier, SURVEY §4.4): every CLI state must
produce a frame with plausible content and clean lints."""

import numpy as np
import pytest

from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.host.main import SCREENSHOT_STATES, apply_screenshot_state
from whisper_git_tpu.ui.layout import layout_tree
from whisper_git_tpu.ui.lint import run_lints

# Pixel-render a representative subset (each render costs ~1s on CPU);
# every state still gets a build+layout+lint pass.
RENDER_STATES = {"history", "settings", "confirm", "many-worktrees-open"}


@pytest.fixture(scope="module")
def fixture_repo(tmp_path_factory):
    from whisper_git_tpu.tools.dump_bundles import make_fixture_repo
    return make_fixture_repo(str(tmp_path_factory.mktemp("states")))


@pytest.mark.parametrize("state", SCREENSHOT_STATES)
def test_state_builds_and_lints(state, fixture_repo):
    if state == "welcome":
        app = WhisperApp.with_tabs([])
    else:
        tab = RepoTab.open(fixture_repo)
        tab.refresh_sync()
        app = WhisperApp.with_tabs([tab])
    apply_screenshot_state(app, state)
    tree = app.build((1280.0, 800.0))
    root = layout_tree(tree, (1280.0, 800.0))
    findings = [f for f in run_lints(root) if f.rule == "MissingSurfaceFill"]
    assert findings == [], (state, findings)
    if state in RENDER_STATES:
        from whisper_git_tpu.host.screenshot_mode import render_frame
        img = render_frame(app, 640, 400)
        assert len(np.unique(img.reshape(-1, 4), axis=0)) > 30, state
    for tab in app.tabs:
        tab.stop_workers()
