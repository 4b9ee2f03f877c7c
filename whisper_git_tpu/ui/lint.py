"""Lints over the laid-out tree.

The reference leans on aetna's lint pipeline as its regression gate
(reference: SURVEY §4.3 — `MissingSurfaceFill`, `FocusRingObscured`,
`ScrollbarObscuresFocusable`; docs/aetna-port.md gates on zero findings).
Ours re-implements the load-bearing ones over `LayoutNode`s.
"""

from __future__ import annotations

from dataclasses import dataclass

from .layout import LayoutNode


@dataclass(frozen=True)
class LintFinding:
    rule: str
    message: str
    x: float
    y: float


def run_lints(root: LayoutNode) -> list[LintFinding]:
    findings: list[LintFinding] = []
    findings += _missing_surface_fill(root)
    findings += _zero_size_interactive(root)
    findings += _text_overflow(root)
    return findings


def _missing_surface_fill(root: LayoutNode) -> list[LintFinding]:
    """Text must sit on some filled ancestor surface (or the root fill)."""
    out: list[LintFinding] = []

    def walk(node: LayoutNode, has_surface: bool):
        if node.el.fill is not None and (node.el.fill[3] if len(node.el.fill) > 3 else 1.0) > 0.05:
            has_surface = True
        if node.el.kind == "text" and node.el.text.strip() and not has_surface:
            out.append(LintFinding(
                "MissingSurfaceFill",
                f"text {node.el.text[:32]!r} has no filled ancestor surface",
                node.x, node.y))
        for c in node.children:
            walk(c, has_surface)

    walk(root, False)
    return out


def _zero_size_interactive(root: LayoutNode) -> list[LintFinding]:
    out: list[LintFinding] = []
    for node in root.walk():
        if node.el.route is not None and (node.w <= 0 or node.h <= 0):
            out.append(LintFinding(
                "ZeroSizeInteractive",
                f"route {node.el.route!r} has zero hit area", node.x, node.y))
    return out


def _text_overflow(root: LayoutNode) -> list[LintFinding]:
    """Non-wrapping text wider than its clip rect by a large margin."""
    out: list[LintFinding] = []
    for node in root.walk():
        if node.el.kind != "text" or node.el.wrap or node.clip is None:
            continue
        cx, cy, cw, ch = node.clip
        if node.x + node.w > cx + cw + 200:
            out.append(LintFinding(
                "TextOverflow",
                f"text {node.el.text[:32]!r} overflows clip by "
                f"{node.x + node.w - (cx + cw):.0f}px", node.x, node.y))
    return out
