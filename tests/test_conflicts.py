"""Merge-conflict and rename flows through the real backend.

The reference surfaces conflicts as a dedicated staging bucket
(WorkingDirStatus.conflicted, status.rs:11), a repo-state label
("MERGING", git/mod.rs:82) and colored status dots; renames show as a
distinct status. These are exercised here against a real temp repo.
"""

from __future__ import annotations

import os
import subprocess

import pytest


@pytest.fixture()
def repo(tmp_path):
    path = tmp_path / "conflict-repo"
    path.mkdir()

    def git(*args, check=True):
        return subprocess.run(
            ["git", "-C", str(path), *args], check=check,
            capture_output=True, text=True)

    subprocess.run(["git", "init", "-q", "-b", "main", str(path)],
                   check=True, capture_output=True)
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "T")
    (path / "shared.txt").write_text("line one\nline two\nline three\n")
    git("add", ".")
    git("commit", "-m", "base")
    return path, git


def test_merge_conflict_status_and_state(repo):
    from whisper_git_tpu.gitcore.repo import GitRepo
    from whisper_git_tpu.gitcore.status import status
    from whisper_git_tpu.gitcore.types import FileStatus

    path, git = repo
    git("checkout", "-q", "-b", "feature")
    (path / "shared.txt").write_text("line one\nFEATURE\nline three\n")
    git("commit", "-am", "feature edit")
    git("checkout", "-q", "main")
    (path / "shared.txt").write_text("line one\nMAIN\nline three\n")
    git("commit", "-am", "main edit")
    merged = git("merge", "feature", check=False)
    assert merged.returncode != 0  # conflict expected

    r = GitRepo.open(str(path))
    st = status(r)
    assert [e.path for e in st.conflicted] == ["shared.txt"]
    assert all(e.status == FileStatus.CONFLICTED for e in st.conflicted)
    # Conflicted entries must not leak into the other buckets.
    assert not any(e.path == "shared.txt" for e in st.staged)
    assert not any(e.path == "shared.txt" for e in st.unstaged)
    # Repo state label (reference: repo_state_label git/mod.rs:82).
    assert "MERG" in (r.repo_state() or "").upper()

    # Conflict markers are visible in the worktree; resolving + staging
    # clears the bucket and the merge can complete.
    content = (path / "shared.txt").read_text()
    assert "<<<<<<<" in content and ">>>>>>>" in content
    (path / "shared.txt").write_text("line one\nRESOLVED\nline three\n")
    git("add", "shared.txt")
    st2 = status(GitRepo.open(str(path)))
    assert not st2.conflicted
    git("commit", "--no-edit")
    assert GitRepo.open(str(path)).repo_state() in (None, "", )


def test_rename_detection_in_commit_diff(repo):
    from whisper_git_tpu.gitcore.diff import commit_diff
    from whisper_git_tpu.gitcore.repo import GitRepo

    path, git = repo
    git("mv", "shared.txt", "renamed.txt")
    git("commit", "-m", "rename shared")
    r = GitRepo.open(str(path))
    files = commit_diff(r, r.head_oid())
    assert files, "rename commit should produce a diff"
    paths = [f.path for f in files]
    assert any("renamed.txt" in p for p in paths)


def test_conflicted_repo_renders_headlessly(repo):
    """The full app pipeline must not choke on a conflicted tree (the
    staging well shows the CONFLICTS bucket)."""
    path, git = repo
    git("checkout", "-q", "-b", "feat2")
    (path / "shared.txt").write_text("A\n")
    git("commit", "-am", "feat2")
    git("checkout", "-q", "main")
    (path / "shared.txt").write_text("B\n")
    git("commit", "-am", "main2")
    git("merge", "feat2", check=False)

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.ui.layout import layout_tree

    tab = RepoTab.open(str(path))
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    try:
        tree = app.build((1280.0, 800.0))
        root = layout_tree(tree, (1280.0, 800.0))
        texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
        assert any("CONFLICT" in t.upper() for t in texts)
        assert any("shared.txt" in t for t in texts)
    finally:
        tab.stop_workers()
