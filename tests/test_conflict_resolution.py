"""In-app merge-conflict resolution (beyond-reference: the reference's
docs/user_needs.md defers "Merge conflict resolution" and its state pill
is inert): Use Ours / Use Theirs / Mark Resolved on conflicted files, and
Continue/Abort for the in-progress operation from the header pill menu.
Driven through the real action router against real conflicted repos."""

from __future__ import annotations

import queue
import subprocess
import time

import pytest

from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp


@pytest.fixture()
def conflicted(tmp_path):
    """A repo mid-merge with shared.txt conflicted."""
    path = tmp_path / "conf"
    path.mkdir()

    def git(*args, check=True):
        return subprocess.run(["git", "-C", str(path), *args], check=check,
                              capture_output=True, text=True)

    subprocess.run(["git", "init", "-q", "-b", "main", str(path)],
                   check=True, capture_output=True)
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "T")
    (path / "shared.txt").write_text("base\n")
    git("add", ".")
    git("commit", "-m", "base")
    git("checkout", "-q", "-b", "feature")
    (path / "shared.txt").write_text("THEIRS\n")
    git("commit", "-am", "feature edit")
    git("checkout", "-q", "main")
    (path / "shared.txt").write_text("OURS\n")
    git("commit", "-am", "main edit")
    assert git("merge", "feature", check=False).returncode != 0
    return path, git


def make_app(path) -> WhisperApp:
    tab = RepoTab.open(str(path))
    tab.refresh_sync()
    return WhisperApp.with_tabs([tab])


def drain_op(app, tab, slot: str, timeout: float = 15.0):
    """Wait for the async op in `slot` and fold its result like the
    frame loop's poll would."""
    op = getattr(tab, slot)
    assert op is not None, f"no op parked in {slot}"
    result = op.rx.get(timeout=timeout)
    setattr(tab, slot, None)
    return result


def test_conflict_menu_entries(conflicted):
    path, git = conflicted
    app = make_app(path)
    app.handle_action("menu-file:conflicted:shared.txt", 100, 100)
    labels = [i.label for i in app.context_menu.items]
    assert "Use Ours (current branch)" in labels
    assert "Use Theirs (incoming)" in labels
    assert "Mark Resolved (stage as-is)" in labels
    assert not any("Discard" in label for label in labels)


def test_resolve_ours(conflicted):
    path, git = conflicted
    app = make_app(path)
    app.handle_action("resolve-conflict:ours:shared.txt")
    assert (path / "shared.txt").read_text() == "OURS\n"
    st = git("status", "--porcelain").stdout
    assert "UU" not in st
    assert any(t.kind == "success" for t in app.toasts)


def test_resolve_theirs(conflicted):
    path, git = conflicted
    app = make_app(path)
    app.handle_action("resolve-conflict:theirs:shared.txt")
    assert (path / "shared.txt").read_text() == "THEIRS\n"
    assert "UU" not in git("status", "--porcelain").stdout


def test_mark_resolved_stages_as_is(conflicted):
    path, git = conflicted
    app = make_app(path)
    (path / "shared.txt").write_text("HAND MERGED\n")
    app.handle_action("resolve-conflict:add:shared.txt")
    assert "UU" not in git("status", "--porcelain").stdout
    assert (path / "shared.txt").read_text() == "HAND MERGED\n"


def test_abort_merge_via_pill_menu(conflicted):
    path, git = conflicted
    app = make_app(path)
    tab = app.current()
    assert tab.repo_state == "Merging"
    # The pill opens a Continue/Abort menu.
    app.handle_action("menu-repo-state", 50, 50)
    labels = [i.label for i in app.context_menu.items]
    assert labels == ["Continue merge", "Abort merge"]
    app.handle_action("abort-op")
    result = drain_op(app, tab, "other_op")
    assert result.success, result.stderr
    assert (path / "shared.txt").read_text() == "OURS\n"
    from whisper_git_tpu.gitcore.repo import GitRepo
    assert GitRepo.open(str(path)).repo_state() is None


def test_continue_merge_after_resolution(conflicted):
    path, git = conflicted
    app = make_app(path)
    tab = app.current()
    app.handle_action("resolve-conflict:theirs:shared.txt")
    app.handle_action("continue-op")
    result = drain_op(app, tab, "other_op")
    assert result.success, result.stderr
    from whisper_git_tpu.gitcore.repo import GitRepo
    r = GitRepo.open(str(path))
    assert r.repo_state() is None
    # The merge commit exists with two parents.
    parents = git("log", "-1", "--format=%P").stdout.split()
    assert len(parents) == 2


def test_abort_cherry_pick(conflicted, tmp_path):
    """Cherry-pick conflicts get the same pill control."""
    path, git = conflicted
    git("merge", "--abort")
    # Create a conflicting cherry-pick: pick the feature edit onto main.
    oid = git("rev-parse", "feature").stdout.strip()
    assert git("cherry-pick", oid, check=False).returncode != 0
    app = make_app(path)
    tab = app.current()
    assert tab.repo_state == "Cherry-picking"
    app.handle_action("abort-op")
    result = drain_op(app, tab, "other_op")
    assert result.success, result.stderr


def test_continue_without_state_is_noop(tmp_path, temp_repo):
    app = make_app(temp_repo)
    tab = app.current()
    app.handle_action("continue-op")
    app.handle_action("abort-op")
    assert tab.other_op is None
    app.handle_action("menu-repo-state", 0, 0)
    assert app.context_menu is None
