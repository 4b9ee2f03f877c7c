"""AI worktree taglines (reference: docs/user_needs.md 'LLM-Generated
Descriptions' — specified there, never implemented): input capture,
clamping, fingerprint-gated spawning, and the synthetic-row surface.
"""

from __future__ import annotations

import os
import queue

from whisper_git_tpu.gitcore.types import CommitInfo
from whisper_git_tpu.services import ai
from whisper_git_tpu.services.ai import clamp_tagline, working_tree_summary_text


def _make_app(path):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(str(path))
    tab.refresh_sync()
    return WhisperApp.with_tabs([tab]), tab


def test_clamp_tagline():
    assert clamp_tagline('"adds retry logic."') == "adds retry logic"
    assert clamp_tagline("first\nsecond") == "first"
    long = "word " * 30
    out = clamp_tagline(long)
    assert len(out) <= 62 and out.endswith("…")
    assert clamp_tagline("   ") == ""


def test_working_tree_summary_text(temp_repo, git):
    assert working_tree_summary_text(temp_repo) == ""
    (__import__("pathlib").Path(temp_repo) / "README.md").write_text("x\n")
    (__import__("pathlib").Path(temp_repo) / "new.txt").write_text("n\n")
    out = working_tree_summary_text(temp_repo)
    assert "README.md" in out and "new.txt" in out
    assert "Untracked files:" in out


def test_spawn_refuses_clean_tree(temp_repo):
    assert ai.spawn_tagline_async(temp_repo) is None


def test_synthetic_worktree_tagline_summary():
    c = CommitInfo.synthetic_for_worktree("wt1", 1000,
                                          tagline="reworks the parser")
    assert c.summary == "reworks the parser (wt1)"
    plain = CommitInfo.synthetic_for_worktree("wt1", 1000)
    assert plain.summary == "Uncommitted changes (wt1)"


def test_poll_spawns_once_per_fingerprint(temp_repo, git, monkeypatch):
    import pathlib
    (pathlib.Path(temp_repo) / "README.md").write_text("dirty\n")
    app, tab = _make_app(temp_repo)
    app.config.ai_taglines = True
    calls = []

    def fake_spawn(path, proxy=None):
        calls.append(path)
        return queue.Queue(maxsize=1)

    monkeypatch.setattr(ai, "spawn_tagline_async", fake_spawn)
    app._poll_taglines(tab)
    assert len(calls) == 1
    # Same fingerprint → no respawn even after the receiver drains empty.
    app._poll_taglines(tab)
    assert len(calls) == 1


def test_poll_drains_and_updates_synthetic_row(temp_repo, git, monkeypatch):
    import pathlib
    (pathlib.Path(temp_repo) / "README.md").write_text("dirty\n")
    app, tab = _make_app(temp_repo)
    app.config.ai_taglines = True
    rx: "queue.Queue" = queue.Queue(maxsize=1)
    monkeypatch.setattr(ai, "spawn_tagline_async",
                        lambda path, proxy=None: rx)
    app._poll_taglines(tab)          # spawns, registers receiver
    assert len(tab.tagline_rx) == 1
    rx.put({"ok": True, "tagline": "tweaks the readme"})
    app._poll_taglines(tab)          # drains, rebuilds synthetics
    wd = tab.repo.workdir
    assert tab.worktree_taglines[wd] == "tweaks the readme"
    synth = [c for c in tab.commits if c.is_synthetic]
    assert synth and synth[0].summary == "tweaks the readme"
    assert tab.tagline_rx == []


def test_poll_error_keeps_stamp_no_retry(temp_repo, git, monkeypatch):
    import pathlib
    (pathlib.Path(temp_repo) / "README.md").write_text("dirty\n")
    app, tab = _make_app(temp_repo)
    app.config.ai_taglines = True
    rx: "queue.Queue" = queue.Queue(maxsize=1)
    calls = []

    def fake_spawn(path, proxy=None):
        calls.append(path)
        return rx

    monkeypatch.setattr(ai, "spawn_tagline_async", fake_spawn)
    app._poll_taglines(tab)
    rx.put({"ok": False, "error": "claude CLI not found in PATH"})
    app._poll_taglines(tab)
    app._poll_taglines(tab)
    assert len(calls) == 1           # stamp prevents a retry loop
    assert tab.worktree_taglines == {}


def test_clean_tree_drops_tagline(temp_repo, git, monkeypatch):
    import pathlib
    f = pathlib.Path(temp_repo) / "README.md"
    f.write_text("dirty\n")
    app, tab = _make_app(temp_repo)
    app.config.ai_taglines = True
    wd = tab.repo.workdir
    tab.worktree_taglines[wd] = "stale tagline"
    tab.tagline_stamps[wd] = "old-fp"
    # Back to clean.
    git(temp_repo, "checkout", "--", "README.md")
    tab.refresh_sync()
    monkeypatch.setattr(ai, "spawn_tagline_async",
                        lambda path, proxy=None: queue.Queue(maxsize=1))
    app._poll_taglines(tab)
    assert wd not in tab.worktree_taglines
    assert wd not in tab.tagline_stamps


def test_disabled_by_default(temp_repo, git, monkeypatch):
    import pathlib
    (pathlib.Path(temp_repo) / "README.md").write_text("dirty\n")
    app, tab = _make_app(temp_repo)
    assert app.config.ai_taglines is False
    called = []
    monkeypatch.setattr(ai, "spawn_tagline_async",
                        lambda *a, **k: called.append(1))
    app._poll_taglines(tab)
    assert called == []


def test_settings_checkbox_and_toggle(temp_repo):
    app, tab = _make_app(temp_repo)
    app.handle_action("open-settings")
    from whisper_git_tpu.app.views import dialogs
    el = dialogs.settings_modal(app.config)

    def routes(e, acc):
        acc.append(getattr(e, "route", None))
        for c in e.children:
            routes(c, acc)
        return acc

    assert "toggle-ai-taglines" in routes(el, [])
    app.handle_action("toggle-ai-taglines")
    assert app.config.ai_taglines is True


def test_branch_intent_flow(temp_repo, git, monkeypatch):
    """Branch intent summarization (design_feedback_feb2026.md:423):
    menu action spawns the claude CLI over the branch's unique
    commits + diffstat; the result lands in an info modal."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.services import ai

    git(temp_repo, "checkout", "-b", "auth-work")
    with open(os.path.join(temp_repo, "auth.py"), "w") as f:
        f.write("def login(): pass\n")
    git(temp_repo, "add", "-A")
    git(temp_repo, "commit", "-m", "add login scaffolding")
    git(temp_repo, "checkout", "main")

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])

    captured = {}

    def fake_gen(text, **k):
        captured["prompt"] = text
        return {"ok": True, "summary": "Builds the login/auth scaffolding."}

    monkeypatch.setattr(ai, "find_claude_binary", lambda: "/bin/claude")
    monkeypatch.setattr(ai, "generate_intent_via_claude_cli", fake_gen)
    app.handle_action("branch-intent:auth-work")
    assert tab.intent_rx is not None
    # Prompt carries the branch's unique commit and stats, not noise.
    import time as _time
    for _ in range(50):
        if not tab.intent_rx[1].empty():
            break
        _time.sleep(0.05)
    app._poll_op_slots(tab)
    assert app.modal is not None and app.modal[0] == "info"
    assert "auth-work" in app.modal[1].title
    assert "login/auth scaffolding" in app.modal[1].message
    assert "add login scaffolding" in captured["prompt"]
    assert "auth.py" in captured["prompt"]

    # Menu exposes the item.
    app.modal = None
    app.handle_action("menu-branch:auth-work")
    labels = [i.label for i in app.context_menu.items]
    assert "Summarize Intent (AI)" in labels
    tab.stop_workers()


def test_branch_intent_no_unique_commits(temp_repo, git, monkeypatch):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.services import ai

    git(temp_repo, "branch", "same-as-main")
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    monkeypatch.setattr(ai, "find_claude_binary", lambda: "/bin/claude")
    app.handle_action("branch-intent:same-as-main")
    # The no-unique-commits check runs on the WORKER thread (the git log
    # must never block the UI thread) and signals through the queue.
    assert tab.intent_rx is not None
    import time as _time
    for _ in range(100):
        app._poll_op_slots(tab)
        if tab.intent_rx is None:
            break
        _time.sleep(0.05)
    assert tab.intent_rx is None
    assert any("no commits of its own" in t.message for t in app.toasts)
    tab.stop_workers()
