"""Async engine tests: classifier logic (reference tier §4.1, mirroring
watcher.rs:629-685), debounce timing, refresh workers and dirty fanout
against real temp repos, async ops, and the error classifier."""

import os
import queue
import time

import pytest

from whisper_git_tpu.engine import (
    DirtyCheckResult,
    EventLoopProxy,
    FsChangeKind,
    classify_git_error,
    spawn_dirty_checks,
    spawn_repo_state_refresh,
    spawn_status_refresh,
)
from whisper_git_tpu.engine.async_ops import (
    PushOptions,
    clone_async,
    push_with_options_async,
    run_git_async,
    stash_push_async,
)
from whisper_git_tpu.engine.debounce import spawn_debounce_thread
from whisper_git_tpu.engine.watcher import (
    WatchConfig,
    Watcher,
    classify_event,
    classify_git_path,
    spawn_init,
)
from whisper_git_tpu.gitcore import GitRepo


# -- classifier (pure logic) -------------------------------------------------

def test_classify_git_path():
    assert classify_git_path("HEAD") == FsChangeKind.GIT_METADATA
    assert classify_git_path("index") == FsChangeKind.GIT_METADATA
    assert classify_git_path("refs/heads/main") == FsChangeKind.GIT_METADATA
    assert classify_git_path("packed-refs") == FsChangeKind.GIT_METADATA
    assert classify_git_path("MERGE_HEAD") == FsChangeKind.GIT_METADATA
    assert classify_git_path("worktrees/wt1") == FsChangeKind.WORKTREE_STRUCTURE
    assert classify_git_path("worktrees/wt1/HEAD") == FsChangeKind.GIT_METADATA
    assert classify_git_path("objects/ab/cdef") is None
    assert classify_git_path("index.lock") is None


def _cfg(tmp_path, **kw):
    wd = str(tmp_path / "repo")
    return WatchConfig(
        workdir=wd, git_dir=os.path.join(wd, ".git"),
        common_dir=os.path.join(wd, ".git"), **kw)


def test_classify_event_working_tree(tmp_path):
    cfg = _cfg(tmp_path)
    assert classify_event(cfg.workdir + "/src/main.py", cfg) == FsChangeKind.WORKING_TREE
    assert classify_event(cfg.workdir + "/.git/HEAD", cfg) == FsChangeKind.GIT_METADATA
    assert classify_event(cfg.workdir + "/.git/objects/ab/cd", cfg) is None
    assert classify_event("/somewhere/else", cfg) is None


def test_classify_event_worktree_root_structural(tmp_path):
    # Mirrors reference watcher.rs:629 tests: worktree-root delete/create is
    # structural, an edit inside the linked worktree is working-tree.
    wt = str(tmp_path / "wt1")
    cfg = _cfg(tmp_path, worktree_roots=(wt,))
    assert classify_event(wt, cfg, is_create_or_delete=True) == FsChangeKind.WORKTREE_STRUCTURE
    assert classify_event(wt + "/file.txt", cfg) == FsChangeKind.WORKING_TREE
    assert classify_event(wt + "/.git", cfg) == FsChangeKind.GIT_METADATA


def test_classify_event_submodule_excluded(tmp_path):
    cfg = _cfg(tmp_path)
    sub = os.path.join(cfg.workdir, "vendor", "esp-idf")
    cfg = WatchConfig(workdir=cfg.workdir, git_dir=cfg.git_dir,
                      common_dir=cfg.common_dir, submodule_paths=(sub,))
    assert classify_event(sub + "/huge/file.c", cfg) is None
    assert classify_event(cfg.workdir + "/own.c", cfg) == FsChangeKind.WORKING_TREE


def test_kind_priority_and_debounce_constants():
    assert FsChangeKind.WORKTREE_STRUCTURE > FsChangeKind.GIT_METADATA > FsChangeKind.WORKING_TREE
    assert FsChangeKind.WORKING_TREE.debounce_ms == 500
    assert FsChangeKind.GIT_METADATA.debounce_ms == 150
    assert FsChangeKind.WORKTREE_STRUCTURE.debounce_ms == 150


# -- debounce ---------------------------------------------------------------

def test_debounce_coalesces_and_max_priority():
    raw, out = queue.Queue(), queue.Queue()
    stop = spawn_debounce_thread(raw, out)
    try:
        for _ in range(5):
            raw.put(FsChangeKind.GIT_METADATA)
        raw.put(FsChangeKind.WORKTREE_STRUCTURE)
        got = out.get(timeout=2.0)
        assert got == FsChangeKind.WORKTREE_STRUCTURE  # max-priority wins
        assert out.empty()  # coalesced into one
    finally:
        stop.set()


def test_debounce_lanes_independent():
    raw, out = queue.Queue(), queue.Queue()
    stop = spawn_debounce_thread(raw, out)
    try:
        raw.put(FsChangeKind.WORKING_TREE)
        raw.put(FsChangeKind.GIT_METADATA)
        first = out.get(timeout=2.0)
        second = out.get(timeout=2.0)
        # Metadata lane (150 ms) must fire before the working-tree lane (500 ms).
        assert first == FsChangeKind.GIT_METADATA
        assert second == FsChangeKind.WORKING_TREE
    finally:
        stop.set()


def test_debounce_hard_cap():
    raw, out = queue.Queue(), queue.Queue()
    stop = spawn_debounce_thread(raw, out, hard_cap_ms=300)
    try:
        t0 = time.monotonic()
        deadline = t0 + 1.0
        fired = None
        while time.monotonic() < deadline:
            raw.put(FsChangeKind.GIT_METADATA)  # sustained activity
            try:
                fired = out.get(timeout=0.02)
                break
            except queue.Empty:
                pass
        assert fired == FsChangeKind.GIT_METADATA
        assert time.monotonic() - t0 < 0.9  # cap beat the 1 s of activity
    finally:
        stop.set()


# -- refresh workers --------------------------------------------------------

def test_status_refresh_worker(temp_repo):
    repo = GitRepo.open(temp_repo)
    with open(os.path.join(temp_repo, "dirty.txt"), "w") as f:
        f.write("d\n")
    proxy = EventLoopProxy()
    rx = spawn_status_refresh(repo, tab_id=7, proxy=proxy)
    result = rx.get(timeout=10)
    assert result.tab_id == 7
    st = result.statuses[repo.workdir]
    assert [e.path for e in st.untracked] == ["dirty.txt"]
    assert proxy.wake_count == 1


def test_repo_state_refresh_worker(temp_repo, git, tmp_path):
    git(temp_repo, "tag", "v1")
    wt = tmp_path / "wt-x"
    git(temp_repo, "worktree", "add", "-b", "wtb", str(wt))
    repo = GitRepo.open(temp_repo)
    rx = spawn_repo_state_refresh(repo, tab_id=3)
    result = rx.get(timeout=20)
    assert result.tab_id == 3
    assert len(result.commits) == 1
    assert {t.name for t in result.branch_tips} == {"main", "wtb"}
    assert [t.name for t in result.tags] == ["v1"]
    assert len(result.worktrees) == 2
    assert result.current_branch == "main"
    assert result.ref_fingerprint
    assert result.errors == []
    assert str(wt) in result.worktree_repos  # pre-opened handle
    assert result.elapsed_ms > 0


def test_dirty_fanout(temp_repo, git, tmp_path):
    wt = tmp_path / "wt-dirty"
    git(temp_repo, "worktree", "add", "-b", "wtd", str(wt))
    (wt / "edit.txt").write_text("x\n")
    repo = GitRepo.open(temp_repo)
    out: "queue.Queue[DirtyCheckResult]" = queue.Queue()
    n = spawn_dirty_checks(repo, tab_id=1, submodule_paths=[],
                           worktree_paths=[str(wt)], out=out)
    assert n == 1
    result = out.get(timeout=10)
    assert result.kind == "worktree" and result.dirty and result.tab_id == 1


# -- async ops --------------------------------------------------------------

def test_run_git_async_success_and_failure(temp_repo):
    rx = run_git_async(temp_repo, ["status"])
    assert rx.get(timeout=10).success
    rx = run_git_async(temp_repo, ["push", "nonexistent-remote", "main"])
    result = rx.get(timeout=10)
    assert not result.success
    assert result.stderr


def test_stash_push_pop_roundtrip(temp_repo):
    with open(os.path.join(temp_repo, "README.md"), "a") as f:
        f.write("stash me\n")
    assert stash_push_async(temp_repo, "wip").get(timeout=10).success
    repo = GitRepo.open(temp_repo)
    assert len(repo.stashes()) == 1


def test_clone_async(temp_repo, tmp_path):
    dest = str(tmp_path / "cloned")
    result = clone_async(temp_repo, dest).get(timeout=30)
    assert result.success, result.stderr
    assert result.stdout == dest
    assert GitRepo.open(dest).commit_graph()[0].summary == "initial commit"


def test_push_with_options_to_local_bare(temp_repo, git, tmp_path):
    bare = str(tmp_path / "origin.git")
    git(tmp_path, "init", "--bare", "-b", "main", bare)
    git(temp_repo, "remote", "add", "origin", bare)
    opts = PushOptions(remote="origin", branch="main", set_upstream=True)
    result = push_with_options_async(temp_repo, opts).get(timeout=15)
    assert result.success, result.stderr
    repo = GitRepo.open(temp_repo)
    tips = [t for t in repo.branch_tips() if not t.is_remote]
    assert tips[0].upstream == "origin/main"


# -- error classifier -------------------------------------------------------

def test_classify_git_error_buckets():
    assert "Authentication" in classify_git_error(
        "fatal: Authentication failed for 'https://x'").message
    assert "SSH key" in classify_git_error(
        "git@github.com: Permission denied (publickey).").message
    assert "not found" in classify_git_error(
        "remote: Repository not found.").message
    assert "Network" in classify_git_error(
        "fatal: unable to access 'https://x': Could not resolve host: x").message
    r = classify_git_error(
        "! [rejected] main -> main (non-fast-forward)\nerror: failed to push")
    assert r.retryable
    assert "overwritten" in classify_git_error(
        "error: Your local changes to the following files would be overwritten by merge:").message
    assert "Conflicts" in classify_git_error(
        "CONFLICT (content): Merge conflict in a.txt\nAutomatic merge failed").message
    # Unknown errors surface their first line verbatim.
    assert classify_git_error("weird unheard-of failure\nmore").message == "weird unheard-of failure"


# -- real watcher (inotify) -------------------------------------------------

def test_watcher_end_to_end(temp_repo, git):
    repo = GitRepo.open(temp_repo)
    cfg = WatchConfig(workdir=repo.workdir, git_dir=repo.git_dir,
                      common_dir=repo.common_dir)
    raw: "queue.Queue[FsChangeKind]" = queue.Queue()
    proxy = EventLoopProxy()
    init_rx = spawn_init(cfg, raw, proxy)
    watcher = init_rx.get(timeout=10)
    try:
        # Working-tree edit.
        with open(os.path.join(temp_repo, "watched.txt"), "w") as f:
            f.write("w\n")
        kind = raw.get(timeout=5)
        assert kind == FsChangeKind.WORKING_TREE
        while not raw.empty():
            raw.get_nowait()
        # Metadata change: a commit moves refs/HEAD.
        git(temp_repo, "commit", "--allow-empty", "-m", "tick")
        kinds = {raw.get(timeout=5)}
        deadline = time.monotonic() + 1.0
        while time.monotonic() < deadline:
            try:
                kinds.add(raw.get(timeout=0.1))
            except queue.Empty:
                break
        assert FsChangeKind.GIT_METADATA in kinds
    finally:
        watcher.stop()


def test_watcher_submodule_exclusion_hotswap(temp_repo):
    repo = GitRepo.open(temp_repo)
    subdir = os.path.join(temp_repo, "vendor")
    os.makedirs(subdir)
    cfg = WatchConfig(workdir=repo.workdir, git_dir=repo.git_dir,
                      common_dir=repo.common_dir)
    raw: "queue.Queue[FsChangeKind]" = queue.Queue()
    watcher = Watcher(cfg, raw)
    try:
        watcher.update_submodule_paths([subdir])
        with open(os.path.join(subdir, "inside.txt"), "w") as f:
            f.write("x\n")
        time.sleep(0.5)
        kinds = []
        while not raw.empty():
            kinds.append(raw.get_nowait())
        assert FsChangeKind.WORKING_TREE not in kinds
    finally:
        watcher.stop()
