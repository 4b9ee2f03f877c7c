"""Project Rewind (services/rewind.py): snapshot log semantics, the
diff/restore computations, cadence recording through the app poll loop,
and the timeline modal (reference design spec:
design_feedback_feb2026.md:368-414 — specified there, never built)."""

from __future__ import annotations

import os
import time

from whisper_git_tpu.services.rewind import (
    MAX_SNAPSHOTS,
    RewindLog,
    RewindSnapshot,
    RewindState,
    diff_to_now,
    restore_commands,
    snapshot_of_tab,
)
from whisper_git_tpu.ui.layout import layout_tree
from whisper_git_tpu.ui.lint import run_lints


def _snap(ts=0.0, head="a" * 40, branch="main", **kw) -> RewindSnapshot:
    return RewindSnapshot(ts=ts, head_oid=head, branch=branch, **kw)


# -- log semantics ------------------------------------------------------------

def test_log_roundtrip_and_dedup(tmp_path):
    log = RewindLog("repoA", root=str(tmp_path))
    assert log.record(_snap(ts=1.0))
    assert not log.record(_snap(ts=2.0)), "same state must not append"
    assert log.record(_snap(ts=3.0, unstaged=("f.txt",)))
    assert len(log.snapshots) == 2

    # Reload from disk: same content, tuples restored.
    log2 = RewindLog("repoA", root=str(tmp_path))
    assert len(log2.snapshots) == 2
    assert log2.snapshots[1].unstaged == ("f.txt",)
    assert log2.snapshots[0].fingerprint() == _snap(ts=9.9).fingerprint()


def test_label_upgrades_duplicate(tmp_path):
    log = RewindLog("repoB", root=str(tmp_path))
    log.record(_snap(ts=1.0))
    assert log.record(_snap(ts=2.0, label="after pull"))
    assert len(log.snapshots) == 1
    assert log.snapshots[0].label == "after pull"


def test_log_prunes_to_cap(tmp_path):
    log = RewindLog("repoC", root=str(tmp_path))
    for i in range(MAX_SNAPSHOTS + 25):
        log.record(_snap(ts=float(i), head=f"{i:040d}"))
    assert len(log.snapshots) == MAX_SNAPSHOTS
    assert len(RewindLog("repoC", root=str(tmp_path)).snapshots) \
        == MAX_SNAPSHOTS


def test_corrupt_line_skipped(tmp_path):
    log = RewindLog("repoD", root=str(tmp_path))
    log.record(_snap(ts=1.0))
    with open(log.path, "a", encoding="utf-8") as f:
        f.write("NOT JSON{{{\n")
    log.record(_snap(ts=2.0, staged=("s.txt",)))
    assert len(RewindLog("repoD", root=str(tmp_path)).snapshots) == 2


# -- diff + restore -----------------------------------------------------------

def test_diff_to_now_lines():
    past = _snap(branch="feature", head="b" * 40,
                 branch_tips=(("feature", "b" * 40), ("main", "c" * 40)),
                 unstaged=("x.py",), stashes=("wip",))
    now = _snap(branch="main", head="c" * 40,
                branch_tips=(("main", "d" * 40),),
                untracked=("y.py",))
    lines = diff_to_now(past, now)
    joined = "\n".join(lines)
    assert "branch: feature → main" in joined
    assert f"HEAD: {'b' * 8} → {'c' * 8}" in joined
    assert "branch feature: deleted" in joined
    assert f"branch main: {'c' * 8} → {'d' * 8}" in joined
    assert "stashes: 1 → 0" in joined
    assert "unstaged then, not now: x.py" in joined
    assert "untracked now, not then: y.py" in joined
    assert diff_to_now(now, now) == \
        ["no differences — this is the current state"]


def test_restore_commands_positions_only():
    past = _snap(branch="feature", head="b" * 40,
                 branch_tips=(("feature", "b" * 40),),
                 unstaged=("gone.py",))
    now = _snap(branch="main", head="c" * 40,
                branch_tips=(("feature", "e" * 40), ("main", "c" * 40)))
    cmds = restore_commands(past, now)
    assert cmds[0] == "git checkout feature"
    assert any(c.startswith(f"git reset --soft {'b' * 12}") for c in cmds)
    # Contents were never snapshotted → comment, not a destructive command.
    assert any(c.startswith("#") and "gone.py" in c for c in cmds)
    assert all(not c.startswith("git checkout --") for c in cmds)
    assert restore_commands(now, now) == ["# already at this state"]


def test_restore_detached():
    past = _snap(branch="", head="b" * 40)
    now = _snap(branch="main", head="c" * 40)
    assert restore_commands(past, now)[0] == \
        f"git checkout --detach {'b' * 12}"


# -- app integration ----------------------------------------------------------

def _make_app(path):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(path)
    tab.refresh_sync()
    return WhisperApp.with_tabs([tab])


def test_snapshot_of_tab_and_cadence(temp_repo, tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    tab = app.current()
    snap = snapshot_of_tab(tab)
    assert snap is not None and snap.branch == "main"
    assert snap.head_oid == tab.head_oid

    # Cadence recording through the poll loop's safety-net pass (status
    # net kept quiet so the tab counts as settled in this pass).
    tab.last_rewind = 0.0
    tab.last_status_query = time.monotonic()
    app._poll_safety_nets(tab, time.monotonic())
    assert tab.rewind_log is not None
    assert len(tab.rewind_log.snapshots) == 1
    assert tab.rewind_log.path.startswith(str(tmp_path / "state"))
    # Second pass inside the cadence window: nothing new.
    app._poll_safety_nets(tab, time.monotonic())
    assert len(tab.rewind_log.snapshots) == 1
    for tb in app.tabs:
        tb.stop_workers()


def test_op_label_records_settled_snapshot(temp_repo, tmp_path,
                                           monkeypatch):
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    tab = app.current()
    tab.last_rewind = time.monotonic()  # cadence quiet
    tab.pending_rewind_label = "after pulled"
    # Dirty the tree so the labeled snapshot differs from any prior one.
    with open(os.path.join(temp_repo, "new.txt"), "w") as f:
        f.write("x\n")
    tab.refresh_sync()
    # Keep the 30 s status net quiet so the tab counts as settled in THIS
    # pass (in the live loop the label simply records one poll later).
    tab.last_status_query = time.monotonic()
    app._poll_safety_nets(tab, time.monotonic())
    assert tab.pending_rewind_label == ""
    assert tab.rewind_log.snapshots[-1].label == "after pulled"
    for tb in app.tabs:
        tb.stop_workers()


def test_rewind_modal_renders_and_scrubs(temp_repo, tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    tab = app.current()
    # Seed a past state, then open.
    app._record_rewind(tab, label="session start")
    tab.rewind_log.record(_snap(ts=time.time(), head="9" * 40,
                                branch="old", unstaged=("a.py",)))
    app.handle_action("open-rewind")
    assert app.modal is not None and app.modal[0] == "rewind"
    st = app.modal[1]
    assert len(st.snapshots) >= 2
    assert st.index == len(st.snapshots) - 1

    # Scrub back via keyboard; commands toggle; copy.
    app.on_key("Left")
    assert st.index == len(st.snapshots) - 2
    app.handle_action("rewind-commands")
    assert st.show_commands
    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert any("Project Rewind" in t for t in texts)
    assert any("SINCE THEN" in t for t in texts)
    assert any("RESTORE COMMANDS" in t for t in texts)
    assert run_lints(root) == []

    import subprocess as sp

    def no_tools(*a, **k):
        raise OSError("no clipboard tool")

    monkeypatch.setattr(sp, "run", no_tools)
    app.handle_action("rewind-copy")
    assert "git" in app.selection_text or "#" in app.selection_text

    app.on_key("Escape")
    assert app.modal is None
    for tb in app.tabs:
        tb.stop_workers()


def test_rewind_disabled_records_nothing(temp_repo, tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    app.config.rewind_enabled = False
    tab = app.current()
    tab.last_rewind = 0.0
    app._poll_safety_nets(tab, time.monotonic())
    assert tab.rewind_log is None
    for tb in app.tabs:
        tb.stop_workers()


def test_welcome_back_toast(temp_repo, tmp_path, monkeypatch):
    """Context restoration (design_feedback_feb2026.md:428): when the
    last session's snapshot is old, the first poll of a new session
    toasts where the user left off."""
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    tab = app.current()
    # Seed yesterday's final state into the log.
    log = app._rewind_log(tab)
    log.record(RewindSnapshot(ts=time.time() - 7200, head_oid="a" * 40,
                              branch="feature/auth",
                              unstaged=("auth.py",),
                              label="after pulled"))
    tab.last_rewind = 0.0
    tab.last_status_query = time.monotonic()
    app._poll_safety_nets(tab, time.monotonic())
    msgs = [t.message for t in app.toasts]
    assert any("Welcome back: 2h ago" in m and "feature/auth" in m
               and "1 modified" in m and "after pulled" in m
               for m in msgs), msgs
    # Fresh sessions (recent snapshot) stay quiet.
    app2 = _make_app(temp_repo)
    tab2 = app2.current()
    tab2.last_rewind = 0.0
    tab2.last_status_query = time.monotonic()
    app2._poll_safety_nets(tab2, time.monotonic())
    assert not any("Welcome back" in t.message for t in app2.toasts)
    for a in (app, app2):
        for tb in a.tabs:
            tb.stop_workers()


def test_restore_recreates_deleted_branch():
    """A snapshot on a since-deleted branch must restore via
    `git checkout -b <branch> <oid>`, not a failing plain checkout."""
    past = _snap(branch="feature", head="b" * 40,
                 branch_tips=(("feature", "b" * 40),))
    now = _snap(branch="main", head="c" * 40,
                branch_tips=(("main", "c" * 40),))  # feature deleted
    cmds = restore_commands(past, now)
    assert cmds[0].startswith(f"git checkout -b feature {'b' * 12}")
    assert not any(c == "git checkout feature" for c in cmds)


def test_open_rewind_disabled_does_not_record(temp_repo, tmp_path,
                                              monkeypatch):
    """Opening the timeline with snapshots disabled must not write new
    state to disk (the Settings toggle gates ALL recording)."""
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    app.config.rewind_enabled = False
    tab = app.current()
    app.handle_action("open-rewind")
    assert app.modal is not None and app.modal[0] == "rewind"
    assert tab.rewind_log.snapshots == []
    for tb in app.tabs:
        tb.stop_workers()


def test_cadence_waits_for_settled_state(temp_repo, tmp_path, monkeypatch):
    """A refresh in flight defers the cadence snapshot (recording a new
    HEAD with stale status lists would fabricate a state that never
    existed)."""
    import queue as _q

    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    tab = app.current()
    tab.last_rewind = 0.0
    tab.last_status_query = time.monotonic()
    tab.state_refresh_rx = _q.Queue()   # refresh "in flight"
    app._poll_safety_nets(tab, time.monotonic())
    assert tab.rewind_log is None or tab.rewind_log.snapshots == []
    tab.state_refresh_rx = None         # settled → records
    app._poll_safety_nets(tab, time.monotonic())
    assert len(tab.rewind_log.snapshots) == 1
    for tb in app.tabs:
        tb.stop_workers()


def test_dirty_snapshot_persists_across_sessions(temp_repo, tmp_path,
                                                 monkeypatch):
    """Regression: snapshots of DIRTY trees must store path strings —
    StatusEntry objects neither sort (2+ entries) nor JSON-serialize, so
    persistence silently failed while the in-memory log looked fine."""
    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    app = _make_app(temp_repo)
    tab = app.current()
    # Two modified + one untracked: triggers both the sort and the dump.
    with open(os.path.join(temp_repo, "a1.txt"), "w") as f:
        f.write("1\n")
    with open(os.path.join(temp_repo, "a2.txt"), "w") as f:
        f.write("2\n")
    tab.refresh_sync()
    app._record_rewind(tab)
    snaps = tab.rewind_log.snapshots
    assert snaps and snaps[-1].untracked == ("a1.txt", "a2.txt")
    # Reload from DISK — the JSONL write must have happened.
    log2 = RewindLog(tab.repo.common_dir or temp_repo,
                     root=os.path.dirname(tab.rewind_log.path))
    assert log2.snapshots
    assert log2.snapshots[-1].untracked == ("a1.txt", "a2.txt")
    assert log2.snapshots[-1].fingerprint() == snaps[-1].fingerprint()
    for tb in app.tabs:
        tb.stop_workers()


def test_snapshot_multi_worktree_state(tmp_path, git):
    """The spec's timeline mockup lists every working tree's dirty state
    (design_feedback_feb2026.md:390); snapshots carry (name, n_dirty)
    pairs when the repo has multiple worktrees."""
    repo = str(tmp_path / "wts")
    os.makedirs(repo)
    git(repo, "init", "-b", "main")
    git(repo, "config", "user.email", "t@t.t")
    git(repo, "config", "user.name", "T")
    with open(os.path.join(repo, "x.txt"), "w") as f:
        f.write("x\n")
    git(repo, "add", "-A")
    git(repo, "commit", "-m", "base")
    git(repo, "worktree", "add", str(tmp_path / "wt2"), "-b", "side")
    with open(str(tmp_path / "wt2" / "dirty.txt"), "w") as f:
        f.write("d\n")

    from whisper_git_tpu.app.repo_tab import RepoTab
    tab = RepoTab.open(repo)
    tab.refresh_sync()
    snap = snapshot_of_tab(tab)
    assert snap is not None
    names = dict(snap.worktree_state)
    assert len(names) == 2
    assert any(n >= 1 for n in names.values()), names
    tab.stop_workers()
