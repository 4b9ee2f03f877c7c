"""Streaming first-paint for the commit walk (engine/refresh.py
stream_first): a partial head-of-history result lands before the full
walk, and the full apply replaces it without flicker."""

import queue


def _build_repo(git, path, n=30):
    for i in range(n):
        git(path, "commit", "--allow-empty", "-m", f"c{i}")


def test_two_phase_results(temp_repo, git):
    from whisper_git_tpu.engine.refresh import spawn_repo_state_refresh
    from whisper_git_tpu.gitcore.repo import GitRepo

    _build_repo(git, temp_repo, 30)
    repo = GitRepo.open(temp_repo)
    rx = spawn_repo_state_refresh(repo, tab_id=7, stream_first=10)
    first = rx.get(timeout=30)
    assert first.partial
    assert len(first.commits) == 10
    assert first.branch_tips and first.head_oid
    full = rx.get(timeout=30)
    assert not full.partial
    assert len(full.commits) == 31  # 30 + initial
    assert full.tags == [] and full.worktrees  # full metadata present


def test_no_partial_when_disabled(temp_repo, git):
    from whisper_git_tpu.engine.refresh import spawn_repo_state_refresh
    from whisper_git_tpu.gitcore.repo import GitRepo

    rx = spawn_repo_state_refresh(GitRepo.open(temp_repo), tab_id=1)
    result = rx.get(timeout=30)
    assert not result.partial
    with__empty = True
    try:
        rx.get_nowait()
        with__empty = False
    except queue.Empty:
        pass
    assert with__empty


def test_partial_apply_then_full_apply_no_flicker(temp_repo, git):
    """App-level: the partial paints the graph (initial_refresh_done
    stays False, receiver stays open), the full apply supersedes it —
    commit count only grows, never shrinks (no flicker)."""
    from whisper_git_tpu.app.repo_tab import RepoTab

    _build_repo(git, temp_repo, 25)
    tab = RepoTab.open(temp_repo)
    # Force streaming with a small slice regardless of repo size.
    from whisper_git_tpu.engine.refresh import spawn_repo_state_refresh
    tab.state_refresh_rx = spawn_repo_state_refresh(
        tab.repo, tab.tab_id, stream_first=8)

    partial = tab.state_refresh_rx.get(timeout=30)
    assert partial.partial
    effects = tab.apply_state_result(partial)
    assert len([c for c in tab.commits if not c.is_synthetic]) == 8
    assert not tab.initial_refresh_done       # full pass still owed
    assert tab.state_refresh_rx is not None   # receiver stays open
    assert effects.fetch_diff_stats           # ± chips on first paint
    n_after_partial = len(tab.commits)

    full = tab.state_refresh_rx.get(timeout=30)
    assert not full.partial
    tab.apply_state_result(full)
    assert tab.initial_refresh_done
    assert tab.state_refresh_rx is None
    assert len(tab.commits) >= n_after_partial  # grew, never blanked


def test_partial_never_shrinks_painted_graph(temp_repo, git):
    """A partial arriving when content is already painted is a no-op
    (it would momentarily shrink the graph)."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.engine.refresh import RepoStateResult

    _build_repo(git, temp_repo, 5)
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    n = len(tab.commits)
    assert n >= 6
    stale_partial = RepoStateResult(tab_id=tab.tab_id, partial=True)
    stale_partial.commits = tab.commits[:2]
    tab.apply_state_result(stale_partial)
    assert len(tab.commits) == n


def test_stale_guard_preserved_after_partial(temp_repo, git):
    """The full result's stale-data guard still applies: an empty full
    walk after a successful partial keeps the painted slice."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.engine.refresh import RepoStateResult

    _build_repo(git, temp_repo, 5)
    tab = RepoTab.open(temp_repo)
    from whisper_git_tpu.engine.refresh import spawn_repo_state_refresh
    tab.state_refresh_rx = spawn_repo_state_refresh(
        tab.repo, tab.tab_id, stream_first=3)
    partial = tab.state_refresh_rx.get(timeout=30)
    tab.apply_state_result(partial)
    painted = len(tab.commits)
    assert painted >= 3
    # Drain the real full result; then simulate a failed (empty) one.
    tab.state_refresh_rx.get(timeout=30)
    empty_full = RepoStateResult(tab_id=tab.tab_id)
    effects = tab.apply_state_result(empty_full)
    assert effects.kept_stale_data
    assert len(tab.commits) == painted


def test_infinite_scroll_loads_more(temp_repo, git):
    """End-to-end: scrolling to the bottom raises the walk cap AND the
    refresh actually honors it (the cap used to be silently dropped)."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    # >110 commits: the reflog-orphan recovery (cap 100) backfills past
    # a capped walk, so the repo must outsize walk-cap + orphan-cap for
    # the cap to be observable — exactly the repos infinite scroll is
    # for.
    _build_repo(git, temp_repo, 130)         # 131 commits incl. initial
    tab = RepoTab.open(temp_repo)
    tab.commit_limit = 10
    tab.trigger_state_refresh()
    while tab.state_refresh_rx is not None:
        tab.apply_state_result(tab.state_refresh_rx.get(timeout=60))
    real = [c for c in tab.commits if not c.is_synthetic]
    assert len(real) < 131                   # capped walk (+ orphan cap)

    app = WhisperApp.with_tabs([tab])
    app.build((1280.0, 800.0))               # sets the viewport
    tab.history_scroll = tab.graph_layout.total_height
    app.on_scroll(100.0, app.config.sidebar_width + 50.0, 300.0)
    assert tab.commit_limit == 1010          # cap raised
    assert tab.state_refresh_rx is not None  # refresh spawned
    while tab.state_refresh_rx is not None:
        tab.apply_state_result(tab.state_refresh_rx.get(timeout=60))
    real = [c for c in tab.commits if not c.is_synthetic]
    assert len(real) == 131                  # the rest loaded
    tab.stop_workers()


def test_commit_limit_actually_caps_the_walk(temp_repo, git):
    """Regression: spawn_repo_state_refresh used to drop its max_commits
    argument (bound method passed without args), so infinite scroll's
    growing commit_limit never loaded past the default 1000."""
    from whisper_git_tpu.engine.refresh import spawn_repo_state_refresh
    from whisper_git_tpu.gitcore.repo import GitRepo

    _build_repo(git, temp_repo, 20)
    repo = GitRepo.open(temp_repo)
    rx = spawn_repo_state_refresh(repo, tab_id=1, max_commits=7,
                                  include_orphans=False)
    result = rx.get(timeout=30)
    assert len(result.commits) == 7
    rx = spawn_repo_state_refresh(repo, tab_id=1, max_commits=7)
    assert len(rx.get(timeout=30).commits) >= 7  # orphan path also caps
