"""Diff widget model tests (mirrors the 6 widgets/diff.rs tests in the
reference: row-stream construction, split pairing, hunk actions by
source)."""

from whisper_git_tpu.app.views.diff import (
    build_diff_rows,
    build_split_rows,
    diff_view,
)
from whisper_git_tpu.gitcore.types import DiffFile, DiffHunk, DiffLine, FileStatus
from whisper_git_tpu.ui.layout import layout_tree


def _file(lines, path="a.txt", status=FileStatus.MODIFIED, binary=False):
    hunk = DiffHunk(header="@@ -1,3 +1,3 @@", old_start=1, old_lines=3,
                    new_start=1, new_lines=3, lines=tuple(lines))
    return DiffFile(path=path, old_path=None, status=status,
                    hunks=() if binary else (hunk,), is_binary=binary,
                    additions=sum(1 for l in lines if l.origin == "+"),
                    deletions=sum(1 for l in lines if l.origin == "-"))


LINES = [
    DiffLine(" ", "context", 1, 1),
    DiffLine("-", "old line", 2, None),
    DiffLine("+", "new line", None, 2),
    DiffLine(" ", "tail", 3, 3),
]


def test_unified_row_stream():
    rows = build_diff_rows([_file(LINES)])
    kinds = [r.kind for r in rows]
    assert kinds == ["file", "hunk", "line", "line", "line", "line"]
    assert rows[0].label == "a.txt"
    assert rows[1].label.startswith("@@")


def test_binary_file_row():
    rows = build_diff_rows([_file([], binary=True)])
    assert [r.kind for r in rows] == ["file", "line"]
    assert rows[1].label == "(binary file)"


def test_rename_label():
    f = DiffFile(path="new.txt", old_path="old.txt",
                 status=FileStatus.RENAMED)
    rows = build_diff_rows([f])
    assert rows[0].label == "old.txt → new.txt"


def test_split_pairs_changed_lines():
    rows = build_split_rows([_file(LINES)])
    pairs = [r for r in rows if r.kind == "pair"]
    # context | (-,+) paired | context
    assert len(pairs) == 3
    assert pairs[0].left.content == "context" and pairs[0].right.content == "context"
    assert pairs[1].left.content == "old line"
    assert pairs[1].right.content == "new line"
    assert pairs[2].left.content == "tail"


def test_split_unbalanced_runs():
    lines = [DiffLine("-", "a", 1, None), DiffLine("-", "b", 2, None),
             DiffLine("+", "c", None, 1)]
    rows = build_split_rows([_file(lines)])
    pairs = [r for r in rows if r.kind == "pair"]
    assert len(pairs) == 2
    assert pairs[0].left.content == "a" and pairs[0].right.content == "c"
    assert pairs[1].left.content == "b" and pairs[1].right is None


def test_hunk_buttons_by_source():
    files = [_file(LINES)]
    for source, expected in (("unstaged", ["stage-hunk:0:0",
                                           "confirm-discard-hunk:0:0"]),
                             ("staged", ["unstage-hunk:0:0"]),
                             ("commit", [])):
        el = diff_view(files, source=source)
        root = layout_tree(el, (600, 400))
        routes = [n.el.route for n in root.walk() if n.el.route]
        for r in expected:
            assert r in routes, (source, routes)
        if source == "commit":
            assert "stage-hunk:0:0" not in routes


def test_split_view_renders():
    el = diff_view([_file(LINES)], mode="split", title="a.txt")
    root = layout_tree(el, (800, 400))
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert any("old line" in t for t in texts)
    assert any("new line" in t for t in texts)
    assert any(t == "Unified" for t in texts)  # mode toggle button


def test_word_highlight_split_rendered():
    lines = [DiffLine("-", "let x = 5;", 2, None, ((8, 9),)),
             DiffLine("+", "let x = 42;", None, 2, ((8, 10),))]
    el = diff_view([_file(lines)], mode="split")
    root = layout_tree(el, (800, 300))
    texts = [n.el.text for n in root.walk() if n.el.kind == "text"]
    assert "5" in texts and "42" in texts  # highlighted middles split out
