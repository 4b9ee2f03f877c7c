"""Interactive rebase (beyond-reference: Deferred in the reference's
docs/user_needs.md): plan building, todo-row cycling/reordering, and the
full rebase executed through the scripted sequence editor — squash,
fixup, drop, and reorder each verified against the resulting history."""

from __future__ import annotations

import subprocess

import pytest

from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.gitcore.refs import rebase_plan
from whisper_git_tpu.gitcore.repo import GitRepo


@pytest.fixture()
def linear_repo(tmp_path):
    """base ← A ← B ← C on main."""
    path = tmp_path / "lin"
    path.mkdir()

    def git(*args, check=True):
        return subprocess.run(["git", "-C", str(path), *args], check=check,
                              capture_output=True, text=True)

    subprocess.run(["git", "init", "-q", "-b", "main", str(path)],
                   check=True, capture_output=True)
    git("config", "user.email", "t@example.com")
    git("config", "user.name", "T")
    for name in ("base", "A", "B", "C"):
        (path / f"{name}.txt").write_text(name + "\n")
        git("add", ".")
        git("commit", "-m", name)
    return path, git


def make_app(path) -> WhisperApp:
    tab = RepoTab.open(str(path))
    tab.refresh_sync()
    return WhisperApp.with_tabs([tab])


def subjects(git):
    return git("log", "--format=%s").stdout.split()


def drain(tab, timeout=20.0):
    result = tab.other_op.rx.get(timeout=timeout)
    tab.other_op = None
    return result


def base_oid(git):
    return git("rev-parse", "main~3").stdout.strip()


def test_rebase_plan_oldest_first(linear_repo):
    path, git = linear_repo
    plan = rebase_plan(GitRepo.open(str(path)), base_oid(git))
    assert [s for _, s in plan] == ["A", "B", "C"]


def test_open_modal_and_cycle_actions(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    assert app.modal[0] == "rebase-i"
    form = app.modal[1]
    assert [e.subject for e in form.entries] == ["A", "B", "C"]
    app.handle_action("rebase-i-action:1")
    assert form.entries[1].action == "squash"
    app.handle_action("rebase-i-action:1")
    app.handle_action("rebase-i-action:1")
    assert form.entries[1].action == "drop"
    app.handle_action("rebase-i-action:1")
    assert form.entries[1].action == "pick"


def test_reorder_rows(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    form = app.modal[1]
    app.handle_action("rebase-i-move:2:-1")
    assert [e.subject for e in form.entries] == ["A", "C", "B"]
    app.handle_action("rebase-i-move:0:-1")  # clamped no-op
    assert form.entries[0].subject == "A"


def test_drop_commit_executes(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    tab = app.current()
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    app.handle_action("rebase-i-action:1")  # B → squash
    app.handle_action("rebase-i-action:1")  # → fixup
    app.handle_action("rebase-i-action:1")  # → drop
    app.handle_action("do-rebase-i")
    assert app.modal is None
    result = drain(tab)
    assert result.success, result.stderr
    assert subjects(git) == ["C", "A", "base"]
    assert not (path / "B.txt").exists()


def test_squash_melds_commits(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    tab = app.current()
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    app.handle_action("rebase-i-action:1")  # B → squash into A
    app.handle_action("do-rebase-i")
    result = drain(tab)
    assert result.success, result.stderr
    logs = subjects(git)
    assert len(logs) == 3  # C, A+B melded, base
    assert (path / "B.txt").exists()  # content survives the meld


def test_fixup_keeps_first_message(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    tab = app.current()
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    app.handle_action("rebase-i-action:1")
    app.handle_action("rebase-i-action:1")  # B → fixup
    app.handle_action("do-rebase-i")
    result = drain(tab)
    assert result.success, result.stderr
    assert subjects(git) == ["C", "A", "base"]
    assert (path / "B.txt").exists()


def test_reorder_executes(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    tab = app.current()
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    app.handle_action("rebase-i-move:2:-1")  # C before B
    app.handle_action("do-rebase-i")
    result = drain(tab)
    assert result.success, result.stderr
    assert subjects(git) == ["B", "C", "A", "base"]


def test_first_kept_must_be_pick(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    tab = app.current()
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    app.handle_action("rebase-i-action:0")  # A → squash (invalid first)
    app.handle_action("do-rebase-i")
    assert app.modal is not None  # modal stays open
    assert tab.other_op is None
    assert any(t.kind == "error" for t in app.toasts)


def test_no_commits_toast(linear_repo):
    path, git = linear_repo
    app = make_app(path)
    head = git("rev-parse", "HEAD").stdout.strip()
    app.handle_action(f"open-rebase-interactive:{head}")
    assert app.modal is None
    assert any("No commits" in t.message for t in app.toasts)


def test_modal_renders(linear_repo):
    path, git = linear_repo
    from whisper_git_tpu.ui.layout import layout_tree
    app = make_app(path)
    app.handle_action(f"open-rebase-interactive:{base_oid(git)}")
    app.handle_action("rebase-i-action:1")
    tree = app.build((1280.0, 800.0))
    laid = layout_tree(tree, (1280.0, 800.0))
    keys = []

    def walk(n):
        if n.el.key:
            keys.append(n.el.key)
        for c in n.children:
            walk(c)

    walk(laid)
    assert "modal-rebase-i" in keys
    assert "rebase-i-row:2" in keys
