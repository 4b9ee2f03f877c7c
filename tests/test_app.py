"""App-layer tests: RepoTab reducers (incl. the reference's two reducer
regression tests), the WhisperApp action router driven end-to-end against
real temp repos, keyboard handling, golden dumps with the zero-lint gate,
and a full-pipeline screenshot render."""

import os
import queue
import time

import pytest

from whisper_git_tpu.app.repo_tab import RepoTab, WorktreeView
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.engine.refresh import RepoStateResult, StatusResult
from whisper_git_tpu.gitcore import GitRepo
from whisper_git_tpu.gitcore.types import CommitInfo, WorkingDirStatus, StatusEntry, FileStatus
from whisper_git_tpu.services.config import Config
from whisper_git_tpu.ui.layout import layout_tree
from whisper_git_tpu.ui.lint import run_lints


def make_tab(path) -> RepoTab:
    tab = RepoTab.open(path)
    tab.refresh_sync()
    return tab


def make_app(path) -> WhisperApp:
    return WhisperApp.with_tabs([make_tab(path)])


# -- RepoTab reducers --------------------------------------------------------

def test_refresh_sync_populates(temp_repo):
    tab = make_tab(temp_repo)
    assert len(tab.commits) == 1
    assert tab.current_branch == "main"
    assert tab.graph_layout.lanes == [0]
    assert tab.initial_refresh_done
    assert tab.commits[0].additions == 1  # diff stats applied


def test_status_routes_to_reported_worktree(temp_repo, git, tmp_path):
    """Mirror of the reference's reducer test (repo_tab.rs:1717): a status
    result routes to the *reported* worktree, not the active view."""
    wt = tmp_path / "wt-routed"
    git(temp_repo, "worktree", "add", "-b", "routed", str(wt))
    tab = make_tab(temp_repo)
    assert tab.active_worktree == tab.repo.workdir  # main is active
    dirty = WorkingDirStatus(
        untracked=[StatusEntry("x.txt", FileStatus.UNTRACKED)])
    result = StatusResult(tab_id=tab.tab_id,
                          statuses={str(wt): dirty})
    tab.apply_status_result(result)
    assert tab.worktree_views[str(wt)].dirty
    main_view = tab.worktree_views[tab.repo.workdir]
    assert main_view.status is None or main_view.status.is_clean()


def test_dirty_worktree_synthetic_survives_refresh(temp_repo, git, tmp_path):
    """Mirror of the reference's second reducer test (repo_tab.rs:1760):
    a dirty linked worktree's synthetic row survives a state refresh."""
    wt = tmp_path / "wt-dirty"
    git(temp_repo, "worktree", "add", "-b", "wtd", str(wt))
    (wt / "junk.txt").write_text("x\n")
    tab = make_tab(temp_repo)
    # Dirty-check lands first:
    tab.apply_dirty_check_result("worktree", str(wt), True)
    assert any(c.synthetic_worktree for c in tab.commits)
    # Then a state refresh (hand-built fixture like the reference's :1686):
    fresh = RepoStateResult(
        tab_id=tab.tab_id,
        commits=[c for c in tab.commits if not c.is_synthetic],
        branch_tips=tab.branch_tips, worktrees=tab.worktrees,
        current_branch="main", head_oid=tab.head_oid,
        ref_fingerprint="fp2")
    tab.apply_state_result(fresh)
    assert any(c.synthetic_worktree for c in tab.commits)


def test_stale_data_guard(temp_repo):
    tab = make_tab(temp_repo)
    assert tab.commits
    empty = RepoStateResult(tab_id=tab.tab_id)  # worker returned nothing
    effects = tab.apply_state_result(empty)
    assert effects.kept_stale_data
    assert tab.commits  # graph not blanked


def test_diff_stats_reapplied_after_refresh(temp_repo):
    tab = make_tab(temp_repo)
    oid = tab.commits[0].oid
    assert tab.commits[0].additions is not None
    fresh = RepoStateResult(
        tab_id=tab.tab_id,
        commits=[CommitInfo(oid=oid, short=oid[:7], summary="initial commit",
                            author_name="a", author_email="a@e",
                            timestamp=tab.commits[0].timestamp)],
        current_branch="main", head_oid=oid, ref_fingerprint="fp")
    tab.apply_state_result(fresh)
    assert tab.commits[0].additions == 1  # no ± chip flicker


def test_drafts_survive_refresh(temp_repo):
    tab = make_tab(temp_repo)
    view = tab.active_view()
    view.draft_subject = "precious draft"
    fresh = RepoStateResult(tab_id=tab.tab_id, commits=list(tab.commits),
                            current_branch="main", head_oid=tab.head_oid,
                            worktrees=tab.worktrees, ref_fingerprint="fp")
    tab.apply_state_result(fresh)
    assert tab.active_view().draft_subject == "precious draft"


def test_submodule_drilldown(temp_repo, git, tmp_path):
    child = tmp_path / "child"
    child.mkdir()
    git(child, "init", "-b", "main")
    git(child, "config", "user.email", "t@e.com")
    git(child, "config", "user.name", "T")
    (child / "c.txt").write_text("c\n")
    git(child, "add", ".")
    git(child, "commit", "-m", "child initial")
    git(temp_repo, "-c", "protocol.file.allow=always",
        "submodule", "add", str(child), "sub")
    git(temp_repo, "commit", "-m", "add submodule")
    tab = make_tab(temp_repo)
    drilled = tab.enter_submodule("sub")
    assert drilled is not None
    assert drilled.drill_depth == 1
    assert drilled.pinned_path == "sub"
    assert drilled.pinned_oid == tab.submodules[0].head_oid
    back = drilled.exit_submodule()
    assert back is tab


# -- WhisperApp router -------------------------------------------------------

def test_select_commit_action(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    oid = tab.commits[0].oid
    app.handle_action(f"select-commit:{oid}")
    assert tab.selected_oid == oid
    assert tab.commit_detail is not None
    assert tab.commit_detail.oid == oid
    assert app.diff_files  # commit diff loaded


def test_stage_unstage_via_actions(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    with open(os.path.join(temp_repo, "new.txt"), "w") as f:
        f.write("n\n")
    app.handle_action("stage-file:new.txt")
    from whisper_git_tpu.gitcore import status as gstatus
    assert [e.path for e in gstatus.status(tab.repo).staged] == ["new.txt"]
    app.handle_action("unstage-file:new.txt")
    assert gstatus.status(tab.repo).staged == []


def test_commit_via_action(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    with open(os.path.join(temp_repo, "c.txt"), "w") as f:
        f.write("c\n")
    app.handle_action("stage-file:c.txt")
    view = tab.active_view()
    view.status = None  # force re-read not needed; commit uses draft only
    view.draft_subject = "add c file"
    view.draft_body = "body text"
    app.handle_action("commit")
    assert tab.repo.commit_graph()[0].summary == "add c file"
    assert view.draft_subject == ""
    assert app.focused_input == "subject"  # auto-focus after commit


def test_branch_and_tag_dialog_flow(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    app.handle_action("open-branch-dialog")
    assert app.modal[0] == "branch"
    app.on_text("dev")
    assert app.modal[1].name == "dev"
    app.handle_action("do-create-branch")
    assert app.modal is None
    assert "dev" in {t.name for t in tab.repo.branch_tips()}
    app.handle_action("open-tag-dialog")
    app.on_text("v9")
    app.handle_action("do-create-tag")
    assert "v9" in {t.name for t in tab.repo.tags()}


def test_confirm_reset_hard(temp_repo, git):
    app = make_app(temp_repo)
    tab = app.current()
    first = tab.head_oid
    git(temp_repo, "commit", "--allow-empty", "-m", "second")
    tab.refresh_sync()
    app.handle_action(f"confirm-reset:hard:{first}")
    assert app.modal[0] == "confirm"
    assert "DESTROYS" in app.modal[1].message
    app.handle_action("do-confirm")
    assert tab.repo.head_oid() == first


def test_confirm_discard_file(temp_repo):
    app = make_app(temp_repo)
    p = os.path.join(temp_repo, "README.md")
    with open(p, "a") as f:
        f.write("junk\n")
    app.handle_action("confirm-discard-file:README.md")
    app.handle_action("do-confirm")
    assert open(p).read() == "hello\n"


def test_worktree_menu_jump_to_branch(temp_repo, git, tmp_path):
    wt = tmp_path / "wt-jump"
    git(temp_repo, "worktree", "add", "-b", "jumpy", str(wt))
    app = make_app(temp_repo)
    tab = app.current()
    name = next(w.name for w in tab.worktrees if not w.is_main)
    app.handle_action(f"menu-worktree:{name}", 50, 50)
    jump = next((i for i in app.context_menu.items
                 if i.label == "Jump to Branch"), None)
    assert jump is not None
    app.handle_action(jump.route)
    wt_head = next(w.head_oid for w in tab.worktrees if w.name == name)
    assert tab.selected_oid == wt_head


def test_context_menu_and_escape_ladder(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    oid = tab.commits[0].oid
    app.handle_action(f"menu-commit:{oid}", 100, 100)
    assert app.context_menu is not None
    assert any("Cherry-pick" in i.label for i in app.context_menu.items)
    app.on_key("j")
    app.on_key("Escape")
    assert app.context_menu is None
    # Escape ladder: diff → details.
    app.handle_action(f"select-commit:{oid}")
    app.diff_open = True
    app.on_key("Escape")
    assert not app.diff_open and tab.selected_oid == oid
    app.on_key("Escape")
    assert tab.selected_oid is None


def test_keyboard_graph_nav(temp_repo, git):
    for i in range(3):
        git(temp_repo, "commit", "--allow-empty", "-m", f"c{i}")
    app = make_app(temp_repo)
    tab = app.current()
    app.on_key("j")
    assert tab.selected_oid == tab.commits[0].oid
    app.on_key("j")
    assert tab.selected_oid == tab.commits[1].oid
    app.on_key("k")
    assert tab.selected_oid == tab.commits[0].oid


def test_search_dims(temp_repo, git):
    git(temp_repo, "commit", "--allow-empty", "-m", "fix the bug")
    app = make_app(temp_repo)
    tab = app.current()
    app.on_key("/")
    assert tab.search_active and app.focused_input == "search"
    app.on_text("fix")
    assert tab.search_query == "fix"
    from whisper_git_tpu.app.views.commit_graph import commit_matches_query
    matches = [commit_matches_query(c, "fix") for c in tab.commits]
    assert matches[0] and not matches[1]


def test_tab_management(temp_repo, tmp_path, git):
    other = tmp_path / "other"
    git(tmp_path, "init", "-b", "main", str(other))
    app = make_app(temp_repo)
    app.open_repo(str(other))
    assert len(app.tabs) == 2 and app.active_tab == 1
    app.on_key("Tab", ctrl=True)
    assert app.active_tab == 0
    app.handle_action("tab-close:0")
    assert len(app.tabs) == 1


def test_slot_busy_guard(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    from whisper_git_tpu.app.repo_tab import TimedOp
    q = queue.Queue()
    tab.push_op = TimedOp(q, "Pushing", "Push")
    app.handle_action("push")  # second push must be refused
    assert tab.push_op.rx is q
    assert any("already running" in t.message for t in app.toasts)


def test_push_failure_offers_force_push(temp_repo, git, tmp_path):
    # Push to a bare remote that is ahead → rejected → force-push confirm.
    bare = str(tmp_path / "origin.git")
    git(tmp_path, "init", "--bare", "-b", "main", bare)
    git(temp_repo, "remote", "add", "origin", bare)
    git(temp_repo, "push", "-u", "origin", "main")
    clone = str(tmp_path / "other")
    git(tmp_path, "clone", bare, clone)
    git(clone, "config", "user.email", "o@e.com")
    git(clone, "config", "user.name", "O")
    git(clone, "commit", "--allow-empty", "-m", "remote ahead")
    git(clone, "push")
    git(temp_repo, "commit", "--allow-empty", "-m", "local diverge")
    app = make_app(temp_repo)
    tab = app.current()
    app.handle_action("push")
    assert tab.push_op is not None
    deadline = time.monotonic() + 20
    while tab.push_op is not None and time.monotonic() < deadline:
        app.poll_async_ops()
        time.sleep(0.05)
    assert app.modal is not None and app.modal[0] == "confirm"
    assert app.modal[1].action == "force-push"
    # --force-with-lease needs a fresh remote-tracking ref to hold the
    # lease; fetch like a user would before retrying.
    git(temp_repo, "fetch", "origin")
    app.handle_action("do-confirm")
    deadline = time.monotonic() + 20
    while tab.push_op is not None and time.monotonic() < deadline:
        app.poll_async_ops()
        time.sleep(0.05)
    # Force push succeeded; remote now has our commit.
    bare_repo = GitRepo.open(bare)
    assert bare_repo.commit_graph()[0].summary == "local diverge"


def test_settings_toggle_persists(temp_repo, tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    app = make_app(temp_repo)
    assert app.config.show_avatars
    app.handle_action("toggle-avatars")
    assert not app.config.show_avatars
    assert not Config.load().show_avatars


# -- build / golden dumps ----------------------------------------------------

def test_build_welcome_and_repo_lint_clean(temp_repo):
    app = WhisperApp.with_tabs([])
    root = layout_tree(app.build((1280, 800)), (1280, 800))
    assert run_lints(root) == []
    app = make_app(temp_repo)
    root = layout_tree(app.build((1280, 800)), (1280, 800))
    findings = [f for f in run_lints(root) if f.rule == "MissingSurfaceFill"]
    assert findings == []


def test_dump_bundles(tmp_path):
    from whisper_git_tpu.tools.dump_bundles import dump_all
    out = tmp_path / "bundles"
    n = dump_all(str(out))
    assert n >= 25
    names = {p.name for p in out.iterdir()}
    for scene in ("welcome", "history", "settings", "confirm", "diff",
                  "many-worktrees-open", "commit-details", "multi-tab"):
        assert f"{scene}.svg" in names
        assert f"{scene}.tree.txt" in names
        assert f"{scene}.lint.txt" in names
    # The reference's gate (docs/aetna-port.md:258-279): zero findings of
    # ANY lint rule — MissingSurfaceFill, FocusRingObscured,
    # ScrollbarObscuresFocusable, TextOverflow, ZeroSizeInteractive —
    # across every scene.
    bad = []
    for lint_file in out.glob("*.lint.txt"):
        content = lint_file.read_text()
        if content.strip():
            bad.append((lint_file.name, content))
    assert not bad, bad


def test_screenshot_pipeline(temp_repo):
    from whisper_git_tpu.host.screenshot_mode import render_frame
    app = make_app(temp_repo)
    img = render_frame(app, 640, 400)
    assert img.shape == (400, 640, 4)
    # Non-trivial content: many distinct colors, header present.
    import numpy as np
    assert len(np.unique(img.reshape(-1, 4), axis=0)) > 50


# -- Runner pointer dispatch (reference: Runner::pointer_down, host.rs:268) --

def _file_row_center(app, bucket, path, viewport=(1100.0, 760.0)):
    from whisper_git_tpu.ui.runner import Runner
    r = Runner(app)
    root = r.prepare(viewport)
    for node in root.walk():
        if node.el.key == f"file:{bucket}:{path}":
            return r, node.x + node.w / 2, node.y + node.h / 2
    raise AssertionError(f"file row {bucket}:{path} not found in layout")


def test_runner_double_click_stages(temp_repo):
    """README: 'Stage/unstage individual files (double-click)'."""
    from whisper_git_tpu.gitcore import status as gstatus
    app = make_app(temp_repo)
    tab = app.current()
    with open(os.path.join(temp_repo, "dbl.txt"), "w") as f:
        f.write("x\n")
    tab.refresh_sync()
    runner, x, y = _file_row_center(app, "untracked", "dbl.txt")
    # Two clicks inside the double-click window → toggle-stage fires.
    runner.pointer_down(x, y, now=10.0)
    runner.pointer_down(x, y, now=10.2)
    assert [e.path for e in gstatus.status(tab.repo).staged] == ["dbl.txt"]
    # The first click opened the diff pane; Escape restores staging.
    app.on_key("Escape")
    assert not app.diff_open
    # Double-click the now-staged row → unstages.
    tab.active_view().status = gstatus.status(tab.repo)
    runner, x, y = _file_row_center(app, "staged", "dbl.txt")
    runner.pointer_down(x, y, now=20.0)
    runner.pointer_down(x, y, now=20.2)
    assert gstatus.status(tab.repo).staged == []


def test_runner_slow_clicks_do_not_stage(temp_repo):
    from whisper_git_tpu.gitcore import status as gstatus
    app = make_app(temp_repo)
    tab = app.current()
    with open(os.path.join(temp_repo, "slow.txt"), "w") as f:
        f.write("x\n")
    tab.refresh_sync()
    runner, x, y = _file_row_center(app, "untracked", "slow.txt")
    runner.pointer_down(x, y, now=10.0)
    runner.pointer_down(x, y, now=11.0)  # outside the 400 ms window
    assert gstatus.status(tab.repo).staged == []


def test_runner_right_click_opens_menu(temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    with open(os.path.join(temp_repo, "rc.txt"), "w") as f:
        f.write("x\n")
    tab.refresh_sync()
    runner, x, y = _file_row_center(app, "untracked", "rc.txt")
    runner.pointer_down(x, y, button="right")
    assert app.context_menu is not None


def test_staging_tab_cycle_reaches_file_lists(temp_repo):
    """README: staging Tab cycles subject → body → staged → unstaged."""
    from whisper_git_tpu.gitcore import status as gstatus
    app = make_app(temp_repo)
    tab = app.current()
    with open(os.path.join(temp_repo, "a.txt"), "w") as f:
        f.write("a\n")
    app.handle_action("stage-file:a.txt")
    with open(os.path.join(temp_repo, "b.txt"), "w") as f:
        f.write("b\n")
    tab.refresh_sync()
    view = tab.active_view()
    view.status = gstatus.status(tab.repo)
    app.focus = "staging"
    app.focused_input = ""
    seen = []
    for _ in range(4):
        app.on_key("Tab")
        seen.append(app.focused_input)
    assert seen == ["subject", "body", "staged-list", "unstaged-list"]
    # j/k navigation selects within the focused bucket; Space toggles.
    app.on_key("j")
    assert view.selected_file == "b.txt"
    assert not view.selected_staged
    app.on_key(" ")
    assert sorted(e.path for e in gstatus.status(tab.repo).staged) == [
        "a.txt", "b.txt"]


def test_help_modal(temp_repo):
    """Header Help button (reference ux-design header-bar row) opens the
    keyboard-map modal; Escape closes it; the scene lints clean."""
    app = make_app(temp_repo)
    app.handle_action("open-help")
    assert app.modal == ("help", None)
    tree = app.build((1280.0, 800.0))
    root = layout_tree(tree, (1280, 800))
    assert root.find_route_at(640, 400) is not None  # modal occupies center
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert any("Keyboard Shortcuts" in t for t in texts)
    assert any("Ctrl+Enter" in t for t in texts)
    assert run_lints(root) == []
    app.on_key("Escape")
    assert app.modal is None
    # Header exposes the button.
    app.modal = None
    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    routes = {n.el.route for n in root.walk()}
    assert "open-help" in routes
    for tb in app.tabs:
        tb.stop_workers()


def test_header_workdir_summary_and_fetch_age(temp_repo, git):
    """Header carries a working-directory summary chip and a last-fetch
    age label (the reference's design review: the header 'should show
    tracking status, last fetch time, working directory summary',
    design_feedback_feb2026.md:67). Clean tree + no fetch → neither
    appears."""
    import time as _time

    app = make_app(temp_repo)
    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert not any("modified" in t or "fetched" in t for t in texts)

    # Dirty the tree: one modified, one untracked, one staged.
    import os
    wd = app.current().repo.workdir
    with open(os.path.join(wd, "README.md"), "a") as f:
        f.write("more\n")
    with open(os.path.join(wd, "new.txt"), "w") as f:
        f.write("x\n")
    with open(os.path.join(wd, "staged.txt"), "w") as f:
        f.write("y\n")
    git(wd, "add", "staged.txt")
    app.current().refresh_sync()
    app.current().last_fetch_time = _time.monotonic() - 120.0

    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert any("1 staged" in t and "1 modified" in t
               and "1 untracked" in t for t in texts)
    assert any(t == "fetched 2m ago" for t in texts)
    # The summary chip routes to the staging panel.
    routes = {n.el.route for n in root.walk()}
    assert "focus-staging" in routes
    assert run_lints(root) == []
    for tb in app.tabs:
        tb.stop_workers()


def test_header_conflict_chip(temp_repo, git, tmp_path):
    """Conflicted files surface as a danger chip in the header."""
    wd = temp_repo
    git(wd, "checkout", "-b", "side")
    with open(os.path.join(wd, "README.md"), "w") as f:
        f.write("side version\n")
    git(wd, "commit", "-am", "side change")
    git(wd, "checkout", "main")
    with open(os.path.join(wd, "README.md"), "w") as f:
        f.write("main version\n")
    git(wd, "commit", "-am", "main change")
    import subprocess as sp
    sp.run(["git", "-C", wd, "merge", "side"], capture_output=True)
    app = make_app(wd)
    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert any("1 conflict" in t for t in texts)
    for tb in app.tabs:
        tb.stop_workers()


def test_commit_node_size_and_dual_tone(temp_repo):
    """Node radius scales with lines changed and carries a +/- tone ring
    (design_feedback_feb2026.md:142-155); author strip rides the row's
    left edge (:169)."""
    from whisper_git_tpu.app.views.commit_graph import (
        _delta_tone, _node_radius, build_row)
    from whisper_git_tpu.ops.lanes import RowSegment

    tab = make_tab(temp_repo)
    c = tab.commits[0]
    assert c.additions is not None

    class FakeCommit:
        additions, deletions = 3, 2
        is_synthetic = is_orphan = False
    assert _node_radius(FakeCommit) == 4.0
    FakeCommit.additions = 600
    assert _node_radius(FakeCommit) == 8.5
    # pure addition → green; pure deletion → red
    FakeCommit.additions, FakeCommit.deletions = 10, 0
    g = _delta_tone(FakeCommit)
    FakeCommit.additions, FakeCommit.deletions = 0, 10
    r = _delta_tone(FakeCommit)
    assert g[1] > r[1] and r[0] > g[0]

    seg = RowSegment(kind="node", row=0, lane=0, data=(12.0, 14.0))
    el = build_row(tab, 0, {0: [seg]}, show_avatars=False)
    paths = [n for n in _walk_el(el) if n.kind == "path"]
    circles = [p for p in paths[0].prims if p[0] == "circle"]
    assert len(circles) == 2, "dual-tone node = ring + core"
    assert circles[0][3] > circles[1][3]  # outer ring is larger
    # Author strip: first child is a 3 px rect.
    strip = el.children[0].children[0]
    assert strip.kind == "rect" and strip.width == 3


def _walk_el(el):
    yield el
    for ch in getattr(el, "children", ()) or ():
        yield from _walk_el(ch)


def test_branch_health_staleness(temp_repo, git):
    """Branch Health (design_feedback_feb2026.md:173): sidebar labels dim
    with tip-commit age; HEAD stays full; tips older than the commit walk
    read as abandoned."""
    from whisper_git_tpu.app.views.sidebar import branch_health

    tab = make_tab(temp_repo)
    # Fresh commit → active; HEAD always active.
    tip = next(t for t in tab.branch_tips if t.is_head)
    assert branch_health(tab, tip.oid, True) == 1.0
    assert branch_health(tab, tip.oid, False) == 1.0
    # Unknown oid (outside the walk) → abandoned.
    assert branch_health(tab, "f" * 40, False) == 0.35

    # An old branch: commit with a 40-day-old timestamp.
    import subprocess as sp
    import time as _time
    old = int(_time.time()) - 40 * 86400
    env = dict(os.environ, GIT_AUTHOR_DATE=str(old),
               GIT_COMMITTER_DATE=str(old))
    sp.run(["git", "-C", temp_repo, "checkout", "-qb", "aging"],
           check=True, capture_output=True)
    with open(os.path.join(temp_repo, "aging.txt"), "w") as f:
        f.write("x\n")
    sp.run(["git", "-C", temp_repo, "add", "-A"], check=True,
           capture_output=True)
    sp.run(["git", "-C", temp_repo, "commit", "-qm", "old work"],
           check=True, capture_output=True, env=env)
    sp.run(["git", "-C", temp_repo, "checkout", "-q", "main"],
           check=True, capture_output=True)
    tab.refresh_sync()
    aging = next(t for t in tab.branch_tips if t.name == "aging")
    assert branch_health(tab, aging.oid, False) == 0.55
    tab.stop_workers()


def test_commit_range_compare(temp_repo, git):
    """Range selection + compare (design_feedback_feb2026.md:492): set an
    anchor, compare with another commit → combined diff, row wash,
    Escape ladder clears."""
    # Three commits touching different files.
    for i in (1, 2):
        with open(os.path.join(temp_repo, f"c{i}.txt"), "w") as f:
            f.write(f"content {i}\n")
        git(temp_repo, "add", "-A")
        git(temp_repo, "commit", "-m", f"commit {i}")
    app = make_app(temp_repo)
    tab = app.current()
    newest, mid, oldest = [c.oid for c in tab.commits[:3]]

    # Context-menu path: anchor at oldest, compare with newest.
    app.handle_action(f"compare-set-anchor:{oldest}")
    assert tab.range_anchor == oldest
    app.handle_action(f"compare-with-anchor:{newest}")
    assert tab.compare_range == (oldest, newest)
    assert app.diff_open and app.diff_source == "range"
    assert "2 commits" in app.diff_title
    paths = {f.path for f in app.diff_files}
    assert paths == {"c1.txt", "c2.txt"}

    # Rows between the endpoints carry the accent wash.
    from whisper_git_tpu.ui.layout import layout_tree
    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    del root

    # Shift+click path: select newest, shift-click oldest.
    tab.compare_range = None
    tab.select_commit(newest)
    app.shift_click = True
    app._act_select_commit(oldest, 0, 0)
    app.shift_click = False
    assert tab.compare_range == (oldest, newest)

    # Escape: diff → range → selection.
    app.on_key("Escape")
    assert not app.diff_open and tab.compare_range is not None
    app.on_key("Escape")
    assert tab.compare_range is None and tab.range_anchor is None
    assert tab.selected_oid is not None
    app.on_key("Escape")
    assert tab.selected_oid is None
    for tb in app.tabs:
        tb.stop_workers()


def test_range_diff_gitcore(temp_repo, git):
    from whisper_git_tpu.gitcore.diff import range_commit_count, range_diff

    with open(os.path.join(temp_repo, "x.txt"), "w") as f:
        f.write("a\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "add x")
    tab = make_tab(temp_repo)
    head, base = tab.commits[0].oid, tab.commits[1].oid
    files = range_diff(tab.repo, base, head)
    assert [f.path for f in files] == ["x.txt"]
    assert range_commit_count(tab.repo, base, head) == 1
    assert range_commit_count(tab.repo, head, base) == 0
    tab.stop_workers()


def test_compare_branch_with_current(temp_repo, git):
    git(temp_repo, "checkout", "-b", "other")
    with open(os.path.join(temp_repo, "o.txt"), "w") as f:
        f.write("o\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "other work")
    git(temp_repo, "checkout", "main")
    app = make_app(temp_repo)
    tab = app.current()
    # From main, comparing the 'other' branch against HEAD shows o.txt
    # as present on other / absent here.
    app.handle_action("compare-branch:other")
    assert app.diff_open and app.diff_source == "range"
    assert {f.path for f in app.diff_files} == {"o.txt"}
    # Menu offers the item.
    app.handle_action("menu-branch:other")
    labels = [i.label for i in app.context_menu.items]
    assert "Compare with Current" in labels
    for tb in app.tabs:
        tb.stop_workers()


def _make_submodule_pair(tmp_path, git):
    """Parent repo with a submodule whose workdir has drifted one commit
    past the pinned gitlink."""
    import subprocess as sp
    sub_src = str(tmp_path / "subsrc")
    os.makedirs(sub_src)
    git(sub_src, "init", "-b", "main")
    git(sub_src, "config", "user.email", "t@t.t")
    git(sub_src, "config", "user.name", "T")
    with open(os.path.join(sub_src, "lib.txt"), "w") as f:
        f.write("v1\n")
    git(sub_src, "add", "-A")
    git(sub_src, "commit", "-m", "lib v1")

    parent = str(tmp_path / "parent")
    os.makedirs(parent)
    git(parent, "init", "-b", "main")
    git(parent, "config", "user.email", "t@t.t")
    git(parent, "config", "user.name", "T")
    with open(os.path.join(parent, "app.txt"), "w") as f:
        f.write("app\n")
    git(parent, "add", "-A")
    git(parent, "commit", "-m", "app")
    sp.run(["git", "-C", parent, "-c", "protocol.file.allow=always",
            "submodule", "add", sub_src, "vendor"],
           check=True, capture_output=True)
    git(parent, "commit", "-m", "add submodule")
    # Drift: advance the submodule workdir one commit past the pin.
    subwd = os.path.join(parent, "vendor")
    git(subwd, "config", "user.email", "t@t.t")
    git(subwd, "config", "user.name", "T")
    with open(os.path.join(subwd, "lib.txt"), "w") as f:
        f.write("v2\n")
    git(subwd, "add", "-A")
    git(subwd, "commit", "-m", "lib v2")
    return parent


def test_submodule_drift_menu_and_diff(tmp_path, git):
    """Pin-drift operations (design_feedback_feb2026.md:469): drifted
    submodules offer Show Diff from Expected + Stage Pointer Change; the
    diff shows the submodule's own content change."""
    parent = _make_submodule_pair(tmp_path, git)
    app = make_app(parent)
    tab = app.current()
    sub = next(s for s in tab.submodules if s.path == "vendor")
    assert sub.head_oid and sub.workdir_oid
    assert sub.head_oid != sub.workdir_oid

    app.handle_action("menu-submodule:vendor")
    labels = [i.label for i in app.context_menu.items]
    assert "Show Diff from Expected" in labels
    assert "Stage Pointer Change" in labels

    app.handle_action("submodule-drift-diff:vendor")
    assert app.diff_open
    assert "(expected)" in app.diff_title
    assert {f.path for f in app.diff_files} == {"lib.txt"}

    app.handle_action("stage-submodule-pointer:vendor")
    from whisper_git_tpu.gitcore.status import status as _status
    staged = _status(tab.repo, exclude_submodules=False).staged
    assert "vendor" in {e.path for e in staged}
    for tb in app.tabs:
        tb.stop_workers()


def test_submodule_clean_has_no_drift_items(tmp_path, git):
    parent = _make_submodule_pair(tmp_path, git)
    import subprocess as sp
    # Reset the submodule back to the pin: no drift items.
    sp.run(["git", "-C", parent, "submodule", "update", "--init"],
           check=True, capture_output=True)
    app = make_app(parent)
    app.handle_action("menu-submodule:vendor")
    labels = [i.label for i in app.context_menu.items]
    assert "Show Diff from Expected" not in labels
    for tb in app.tabs:
        tb.stop_workers()


def test_compare_wash_excludes_interleaved_branch(temp_repo, git):
    """The range wash uses the EXACT rev-list set: a side-branch commit
    interleaved in the dated log must not be marked as part of
    base..head on main."""
    with open(os.path.join(temp_repo, "m1.txt"), "w") as f:
        f.write("m1\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "main 1")
    git(temp_repo, "checkout", "-b", "side")
    with open(os.path.join(temp_repo, "s.txt"), "w") as f:
        f.write("s\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "side work")
    git(temp_repo, "checkout", "main")
    with open(os.path.join(temp_repo, "m2.txt"), "w") as f:
        f.write("m2\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "main 2")

    app = make_app(temp_repo)
    tab = app.current()
    side_oid = next(t.oid for t in tab.branch_tips if t.name == "side")
    main_commits = [c for c in tab.commits if c.oid != side_oid]
    base, head = main_commits[2].oid, main_commits[0].oid
    app._open_range_compare(base, head)
    assert head in tab.compare_set and base in tab.compare_set
    assert side_oid not in tab.compare_set
    for tb in app.tabs:
        tb.stop_workers()


def test_compare_diverged_branches(temp_repo, git):
    """Divergence explanation (design_feedback_feb2026.md:425),
    deterministic: comparing tips where neither contains the other
    titles the view as diverged with both unique counts, and the range
    wash covers both unique sides."""
    git(temp_repo, "checkout", "-b", "left")
    with open(os.path.join(temp_repo, "l.txt"), "w") as f:
        f.write("l\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "left work")
    git(temp_repo, "checkout", "main")
    with open(os.path.join(temp_repo, "r.txt"), "w") as f:
        f.write("r\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "right work")
    app = make_app(temp_repo)
    tab = app.current()
    left = next(t.oid for t in tab.branch_tips if t.name == "left")
    app.handle_action("compare-branch:left")
    assert "diverged" in app.diff_title
    assert "(1 own)" in app.diff_title
    assert left in tab.compare_set and tab.head_oid in tab.compare_set
    for tb in app.tabs:
        tb.stop_workers()


def test_keyboard_range_extension(temp_repo, git):
    """Shift+J/K extends a compare range from the keyboard, cursor on
    the moving end (keyboard parity with Shift+click)."""
    for i in (1, 2, 3):
        with open(os.path.join(temp_repo, f"k{i}.txt"), "w") as f:
            f.write(f"{i}\n")
        git(temp_repo, "add", "-A")
        git(temp_repo, "commit", "-m", f"kb {i}")
    app = make_app(temp_repo)
    tab = app.current()
    app.focus = "graph"
    newest = tab.commits[0].oid
    tab.select_commit(newest)
    app.on_key("J", shift=True)
    assert tab.compare_range is not None
    assert newest in tab.compare_range
    assert tab.selected_oid == tab.commits[1].oid  # cursor moved
    app.on_key("J", shift=True)                    # extend further
    assert tab.compare_range == (tab.commits[2].oid, newest)
    assert len(tab.compare_set) >= 2
    app.on_key("K", shift=True)                    # shrink back
    assert tab.compare_range == (tab.commits[1].oid, newest)
    for tb in app.tabs:
        tb.stop_workers()


def test_keyboard_range_collapse(temp_repo, git):
    """Shift+K shrinking a range back onto its fixed end collapses to a
    plain selection — never a degenerate 0-commit compare."""
    with open(os.path.join(temp_repo, "c.txt"), "w") as f:
        f.write("c\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "second")
    app = make_app(temp_repo)
    tab = app.current()
    app.focus = "graph"
    newest = tab.commits[0].oid
    tab.select_commit(newest)
    app.on_key("J", shift=True)
    assert tab.compare_range is not None
    app.on_key("K", shift=True)
    assert tab.compare_range is None
    assert tab.compare_set == frozenset()
    assert not app.diff_open
    assert tab.selected_oid == newest
    for tb in app.tabs:
        tb.stop_workers()


def test_failed_checkout_no_false_success_toast(temp_repo, git):
    """Regression: a checkout blocked by dirty local changes toasted BOTH
    'Checkout failed' and 'Checked out X' — the success toast must be
    conditional on the op actually succeeding."""
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("v1\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "v1")
    git(temp_repo, "checkout", "-b", "other")
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("other\n")
    git(temp_repo, "commit", "-am", "other version")
    git(temp_repo, "checkout", "main")
    with open(os.path.join(temp_repo, "README.md"), "w") as f:
        f.write("dirty local edit\n")   # conflicts with 'other'

    app = make_app(temp_repo)
    tab = app.current()
    app.handle_action("checkout-branch:other")
    kinds = [(t.kind, t.message) for t in app.toasts]
    assert any(k == "error" for k, _ in kinds), kinds
    assert not any(k == "success" for k, _ in kinds), kinds
    assert tab.current_branch == "main"
    for tb in app.tabs:
        tb.stop_workers()


def test_escape_closes_modal_and_releases_typing(temp_repo):
    """Escape on a modal with a focused input must also clear
    focused_input — a stale one keeps _typing() true with no modal and
    silently swallows every printable key (j/k nav, '/', Ctrl+S)."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    app.handle_action("open-branch-dialog:")
    assert app.modal is not None and app.focused_input
    app.on_key("Escape")
    assert app.modal is None
    assert app.focused_input == ""
    # j/k reach navigation again.
    app.focus = "graph"
    before = tab.selected_oid
    app.on_key("j")
    assert tab.selected_oid != before or tab.commits == []
    tab.stop_workers()


def test_push_dialog_seeds_remote_from_repo(temp_repo, git):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    git(temp_repo, "remote", "add", "upstream",
        "https://example.com/r.git")
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    app.handle_action("open-push-dialog:")
    # Single remote named 'upstream': the form must not default to the
    # nonexistent 'origin' (the radios only render with >1 remotes).
    assert app.modal[1].remote == "upstream"
    tab.stop_workers()


def test_modal_card_absorbs_clicks(temp_repo):
    """A click on non-interactive modal-card area (message text,
    padding) must NOT fall through to the scrim's close-modal."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.render.renderer import get_renderer
    from whisper_git_tpu.ui.runner import Runner

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    r = get_renderer()
    runner = Runner(app, measurer=r.measurer)
    app.handle_action("open-token-dialog:")
    assert app.modal is not None
    runner.prepare((1280.0, 800.0))
    # Center of the screen = center of the modal card (align center):
    # inside the card, on its padding/text, not on a field or button.
    runner.pointer_down(640.0, 400.0, button="left")
    runner.pointer_up()
    assert app.modal is not None, "card click fell through to the scrim"
    # A click OUTSIDE the card still closes (scrim behavior preserved).
    runner.pointer_down(30.0, 780.0, button="left")
    runner.pointer_up()
    assert app.modal is None
    tab.stop_workers()


def test_sidebar_page_navigation(temp_repo, git):
    """Reference README sidebar keyboard table: PageUp/PageDown navigate
    by page (with auto-scroll), alongside j/k single steps."""
    for i in range(14):
        git(temp_repo, "branch", f"b{i:02d}")
    app = make_app(temp_repo)
    tab = app.current()
    app.focus = "sidebar"
    keys = app._sidebar_keys(tab)
    assert len(keys) > 11
    app.on_key("j")
    assert tab.selected_sidebar_key == keys[0]
    app.on_key("PageDown")
    assert tab.selected_sidebar_key == keys[10]
    app.on_key("PageUp")
    assert tab.selected_sidebar_key == keys[0]
    app.on_key("PageUp")   # clamps at the top
    assert tab.selected_sidebar_key == keys[0]


def test_row_memo_invalidates_on_late_diff_stats(temp_repo):
    """Diff stats stream in AFTER rows are first built (chunked worker)
    without a relayout — the per-row static-key memo (r5 perf work,
    views/commit_graph.build_row) must rebuild the row with its ±chip
    rather than replaying the stat-less El."""
    from whisper_git_tpu.app.views.commit_graph import build_row

    tab = make_tab(temp_repo)
    oid = tab.commits[0].oid
    # Strip the stats (as if the chunked worker hasn't landed yet).
    tab.commits = [c.with_stats(None, None) if hasattr(c, "with_stats")
                   else c for c in tab.commits]
    import dataclasses
    tab.commits = [dataclasses.replace(c, additions=None, deletions=None)
                   for c in tab.commits]
    el_before = build_row(tab, 0, {})
    tab.apply_diff_stats({oid: (7, 3)})
    assert tab.commits[0].additions == 7
    el_after = build_row(tab, 0, {})
    assert el_after is not el_before, \
        "row memo replayed a stat-less row after stats arrived"

    def texts(el):
        out = []
        stack = [el]
        while stack:
            n = stack.pop()
            if n.kind == "text":
                out.append(n.text)
            stack.extend(n.children)
        return out

    joined = " ".join(texts(el_after))
    assert "+7" in joined and ("−3" in joined or "-3" in joined), joined
