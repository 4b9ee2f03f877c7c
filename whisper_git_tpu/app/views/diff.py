"""Diff viewer widget: GitHub-shaped unified/split diff with virtualized
rows, gutter line numbers, row washes, word-level highlight overlays, and
per-hunk Stage/Unstage/Discard buttons.

Capability parity with reference src/widgets/diff.rs (DiffData :65,
DiffMode :76) + src/diff_view.rs (commit vs working source adapter :17-146).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ...gitcore.types import DiffFile, DiffLine
from ...ui import El, column, rect, row, scroll, spacer, text
from ...ui.theme import DARK as T

ROW_H = 18.0
MONO_SIZE = 12.0


@dataclass(frozen=True)
class DiffRowModel:
    """One renderable row of the diff stream."""

    kind: str   # "file" | "hunk" | "line"
    file_index: int
    hunk_index: int = -1
    line: Optional[DiffLine] = None
    label: str = ""


def build_diff_rows(files: list[DiffFile]) -> list[DiffRowModel]:
    """Flatten DiffFiles into the virtualized row stream
    (reference: widgets/diff.rs rendering model)."""
    rows: list[DiffRowModel] = []
    for fi, f in enumerate(files):
        label = f.path if not f.old_path else f"{f.old_path} → {f.path}"
        rows.append(DiffRowModel("file", fi, label=label))
        if f.is_binary:
            rows.append(DiffRowModel("line", fi, label="(binary file)"))
            continue
        for hi, h in enumerate(f.hunks):
            rows.append(DiffRowModel("hunk", fi, hi, label=h.header))
            for line in h.lines:
                rows.append(DiffRowModel("line", fi, hi, line=line))
    return rows


def _line_el(model: DiffRowModel, hscroll: float) -> El:
    line = model.line
    if line is None:
        return rect(text(model.label, font_size=MONO_SIZE,
                         color=T.text_muted),
                    width="fill", height=ROW_H, padding=(1, 8, 1, 88))
    wash = None
    hl_color = None
    if line.origin == "+":
        wash = T.diff_add_bg
        hl_color = T.diff_add_hl
    elif line.origin == "-":
        wash = T.diff_del_bg
        hl_color = T.diff_del_hl

    old_no = str(line.old_lineno) if line.old_lineno else ""
    new_no = str(line.new_lineno) if line.new_lineno else ""
    gutter = row(
        text(old_no.rjust(4), font_size=10, color=T.text_muted),
        text(new_no.rjust(4), font_size=10, color=T.text_muted),
        gap=6, width=76)

    content = line.content
    cells: list[El] = [gutter,
                       text(line.origin, font_size=MONO_SIZE,
                            color=T.text_muted, width=10)]
    # Word-level highlight overlay: split at the highlight byte range.
    if line.highlights and hl_color is not None:
        start, end = line.highlights[0]
        raw = content.encode()
        pre = raw[:start].decode("utf-8", "replace")
        mid = raw[start:end].decode("utf-8", "replace")
        post = raw[end:].decode("utf-8", "replace")
        cells.append(row(
            text(pre, font_size=MONO_SIZE, color=T.text),
            rect(text(mid, font_size=MONO_SIZE, color=T.text_bright),
                 fill=hl_color, radius=2),
            text(post, font_size=MONO_SIZE, color=T.text),
            align="center"))
    else:
        cells.append(text(content, font_size=MONO_SIZE, color=T.text))
    return rect(row(*cells, gap=4, align="center", height="fill"),
                width="fill", height=ROW_H, fill=wash, clip=True)


def _hunk_header_el(model: DiffRowModel, fi: int, hi: int,
                    source: str) -> El:
    buttons: list[El] = []

    def btn(label, route):
        buttons.append(rect(text(label, font_size=10, color=T.accent),
                            route=route, radius=3, padding=(0, 6, 0, 6),
                            hover_fill=T.surface_hover))

    # Hunk actions depend on the diff source (reference: per-hunk
    # Stage/Unstage/Discard buttons on working diffs only).
    if source == "unstaged":
        btn("Stage", f"stage-hunk:{fi}:{hi}")
        btn("Discard", f"confirm-discard-hunk:{fi}:{hi}")
    elif source == "staged":
        btn("Unstage", f"unstage-hunk:{fi}:{hi}")
    return rect(
        row(text(model.label[:100], font_size=MONO_SIZE, color=T.diff_hunk),
            spacer(), *buttons, gap=6, align="center", width="fill",
            height="fill"),
        width="fill", height=ROW_H + 4, fill=(0.66, 0.33, 0.97, 0.10),
        padding=(1, 8, 1, 8))


def diff_view(files: list[DiffFile], scroll_offset: float = 0.0,
              hscroll: float = 0.0, source: str = "commit",
              title: str = "") -> El:
    """The diff pane. source: "commit" | "staged" | "unstaged"."""
    if not files:
        return rect(text("No changes", color=T.text_muted),
                    fill=T.background, width="fill", height="fill",
                    align="center", key="diff")
    rows = build_diff_rows(files)

    def build(i: int) -> El:
        model = rows[i]
        if model.kind == "file":
            f = files[model.file_index]
            return rect(
                row(text(model.label, font_size=T.font_size, bold=True,
                         color=T.text),
                    spacer(),
                    text(f"+{f.additions} −{f.deletions}", font_size=10,
                         color=T.text_muted),
                    gap=8, align="center", width="fill", height="fill"),
                width="fill", height=ROW_H + 8, fill=T.surface_raised,
                padding=(2, 8, 2, 8), radius=4)
        if model.kind == "hunk":
            return _hunk_header_el(model, model.file_index, model.hunk_index,
                                   source)
        return _line_el(model, hscroll)

    heights = []
    for m in rows:
        heights.append(ROW_H + 8 if m.kind == "file"
                       else ROW_H + 4 if m.kind == "hunk" else ROW_H)

    header = rect(
        row(text(title or "Diff", font_size=T.font_size, bold=True,
                 color=T.text),
            spacer(),
            rect(text("✕", font_size=11, color=T.text_muted),
                 route="close-diff", radius=3, padding=(0, 5, 0, 5),
                 hover_fill=T.surface_hover),
            align="center", width="fill"),
        width="fill", height=26, padding=(3, 8, 3, 8), fill=T.surface_raised)

    return rect(
        column(header,
               scroll(len(rows), build, offset=scroll_offset,
                      row_heights=heights, width="fill", flex=1,
                      key="diff-scroll"),
               width="fill", height="fill"),
        fill=T.background, width="fill", height="fill", clip=True,
        key="diff")
