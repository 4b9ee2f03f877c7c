"""Stochastic async-engine stress: random interleavings of REAL
operations — mutations, refresh triggers, watcher events, poll passes —
against one app instance, asserting the engine's global invariants hold
at every step. The reference's async engine exists because interleaving
bugs were paid for one at a time (docs/async-engine-redesign.md); this
drives thousands of interleavings per run instead of waiting for them.

Deterministic (seeded RNG); real temp repo, real worker threads, no
mocks — consistent with the suite's no-mock-git rule.
"""

from __future__ import annotations

import os
import queue
import random
import subprocess
import time

from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.engine import EventLoopProxy, FsChangeKind


def _invariants(app: WhisperApp, tab: RepoTab) -> None:
    """The engine's global consistency conditions, checked continuously."""
    # Stale-data guard: once populated, the commit list never blanks.
    if tab.initial_refresh_done:
        assert tab.commits, "commit list blanked by a refresh"
    # Single in-flight slot per kind (invariant: one refresh at a time).
    assert tab.state_refresh_rx is None or isinstance(
        tab.state_refresh_rx, queue.Queue)
    # Graph geometry stays consistent with the commit list.
    assert len(tab.graph_layout.row_heights) >= len(tab.commits) \
        or not tab.commits or len(tab.graph_layout.row_heights) == 0 \
        or len(tab.graph_layout.row_heights) == len(tab.commits)
    # Every worktree view belongs to a known path.
    assert tab.repo.workdir in tab.worktree_views


def test_engine_random_interleavings(temp_repo, git):
    rng = random.Random(20260821)
    proxy = EventLoopProxy()
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    app.proxy = proxy
    wd = temp_repo
    n_file = [0]

    def mutate_tree():
        n_file[0] += 1
        with open(os.path.join(wd, f"s{n_file[0] % 7}.txt"), "w") as f:
            f.write(f"content {n_file[0]}\n")

    def mutate_refs():
        name = f"stress-{n_file[0] % 5}"
        subprocess.run(["git", "-C", wd, "branch", "-f", name, "HEAD"],
                       capture_output=True)

    def commit_something():
        mutate_tree()
        git(wd, "add", "-A")
        subprocess.run(["git", "-C", wd, "commit", "-qm",
                        f"stress commit {n_file[0]}"],
                       capture_output=True)

    def trigger_state():
        tab.trigger_state_refresh(proxy)

    def trigger_status():
        tab.trigger_status_refresh(proxy)

    def watcher_event():
        kind = rng.choice([FsChangeKind.WORKING_TREE,
                           FsChangeKind.GIT_METADATA,
                           FsChangeKind.WORKTREE_STRUCTURE])
        tab.watcher_events_q.put(kind)

    def poll():
        app.before_build()

    def build():
        app.build((640.0, 480.0))

    actions = [mutate_tree, mutate_refs, commit_something, trigger_state,
               trigger_status, watcher_event, poll, poll, build]
    deadline = time.monotonic() + 8.0
    steps = 0
    while time.monotonic() < deadline and steps < 400:
        rng.choice(actions)()
        _invariants(app, tab)
        steps += 1
    # Drain: let every in-flight worker land, then final consistency.
    end = time.monotonic() + 10.0
    while time.monotonic() < end and (tab.state_refresh_rx is not None
                                      or tab.status_rx is not None):
        app.before_build()
        time.sleep(0.02)
    app.before_build()
    _invariants(app, tab)
    assert steps >= 100, "stress loop barely ran"
    assert tab.initial_refresh_done
    # The settled state reflects reality: HEAD matches git's.
    head = subprocess.run(["git", "-C", wd, "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    # One more settled refresh to converge after the last mutation.
    tab.trigger_state_refresh(proxy)
    end = time.monotonic() + 10.0
    while time.monotonic() < end and tab.state_refresh_rx is not None:
        app.before_build()
        time.sleep(0.02)
    assert tab.head_oid == head
    view = tab.active_view()
    assert view is not None
    for tb in app.tabs:
        tb.stop_workers()
