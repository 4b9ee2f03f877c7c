"""Content-addressed El memoization must invalidate on every pixel-
affecting state change (ui/memo.py) — a stale hit would freeze a panel
on screen while the state moved on."""

from __future__ import annotations

import subprocess

import pytest


@pytest.fixture()
def app(tmp_path):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    path = tmp_path / "repo"
    path.mkdir()

    def git(*args):
        subprocess.run(["git", "-C", str(path), *args], check=True,
                       capture_output=True)

    subprocess.run(["git", "init", "-q", "-b", "main", str(path)],
                   check=True, capture_output=True)
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "T")
    git("commit", "--allow-empty", "-m", "one")
    git("commit", "--allow-empty", "-m", "two")
    tab = RepoTab.open(str(path))
    tab.refresh_sync(include_orphans=False)
    a = WhisperApp.with_tabs([tab])
    yield a
    for t in a.tabs:
        t.stop_workers()


def _texts(el):
    out = []
    stack = [el]
    while stack:
        n = stack.pop()
        if n.kind == "text":
            out.append(n.text)
        if n.kind == "scroll" and n.virtual_build is not None:
            stack.extend(n.virtual_build(i)
                         for i in range(n.virtual_row_count))
        stack.extend(n.children)
    return out


def test_sidebar_memo_invalidates_on_branch_change(app):
    from whisper_git_tpu.app.views.sidebar import sidebar
    from whisper_git_tpu.gitcore.types import BranchTip

    tab = app.current()
    first = sidebar(tab)
    assert sidebar(tab) is first  # steady state: same object replayed
    tab.branch_tips = tab.branch_tips + [
        BranchTip(name="feature/fresh", oid="f" * 40)]
    second = sidebar(tab)
    assert second is not first
    assert any("feature/fresh" in t for t in _texts(second))


def test_sidebar_memo_invalidates_on_selection_and_collapse(app):
    from whisper_git_tpu.app.views.sidebar import sidebar

    tab = app.current()
    base = sidebar(tab)
    tab.selected_sidebar_key = "branch:main"
    assert sidebar(tab) is not base
    tab.sidebar_collapsed["tags"] = True
    collapsed = sidebar(tab)
    tab.sidebar_collapsed["tags"] = False
    assert sidebar(tab) is not collapsed


def test_staging_memo_invalidates_on_draft_keystroke(app):
    from whisper_git_tpu.app.views.staging import staging_well

    tab = app.current()
    view = tab.active_view()
    first = staging_well(tab, focused_input="")
    assert staging_well(tab, focused_input="") is first
    view.draft_subject = "fix: renderer"
    second = staging_well(tab, focused_input="")
    assert second is not first
    assert any("fix: renderer" in t for t in _texts(second))


def test_history_row_memo_invalidates_on_selection(app):
    from collections import defaultdict

    from whisper_git_tpu.app.views.commit_graph import build_row

    tab = app.current()
    segs = defaultdict(list)
    for s in tab.graph_segments:
        segs[s.row].append(s)
    idx = next(i for i, c in enumerate(tab.commits) if not c.is_synthetic)
    first = build_row(tab, idx, segs)
    assert build_row(tab, idx, segs) is first
    tab.select_commit(tab.commits[idx].oid)
    assert build_row(tab, idx, segs) is not first


def test_header_memo_invalidates_on_branch_switch(app):
    from whisper_git_tpu.app.views.chrome import header_bar

    tab = app.current()
    first = header_bar(app, tab)
    assert header_bar(app, tab) is first
    tab.current_branch = "feature/other"
    assert header_bar(app, tab) is not first
