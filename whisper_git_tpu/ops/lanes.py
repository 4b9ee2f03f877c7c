"""Commit-graph lane assignment + row geometry.

Capability parity with the reference's `GraphLayout`
(reference: src/commit_graph.rs:241-608): lane waiting-for-parent reuse,
lowest-free-lane allocation, first-parent lane inheritance, fresh lanes for
merge parents, an edge list, time-spaced row heights (log curve, 2 h base,
30-day saturation, integer-rounded), and per-row edge decomposition
(same-lane verticals vs cross-lane cubic segments).

Lane assignment is inherently sequential (each row's lane depends on every
prior row) and runs once per refresh on the host — exactly like the
reference, which rebuilds layout on refresh, not per frame. The *geometry*
(bezier subdivision) is batched through ops.bezier (JAX).

Edge model: every child→parent connection occupies one *travel lane* for
its vertical run; it curves away from the child's node at the top when the
travel lane differs from the child's lane (a merge parent forking out).
Under the current allocator the parent always lands IN the travel lane
(a second child joins the existing waiting lane, so exactly one lane
waits per parent OID — fuzz-verified over random DAGs), so the bottom
always terminates straight into the parent's node; the bottom-curve
emission below is retained defensively for future allocator changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..gitcore.types import CommitInfo

# Constants (reference: commit_graph.rs:30-66).
ROW_HEIGHT = 28.0
LANE_WIDTH = 24.0
MAX_VISIBLE_LANES = 6
TIME_GAP_BASE_SECS = 2 * 3600          # 2 h: gaps below this add nothing
TIME_GAP_SATURATION_SECS = 30 * 86400  # 30 days: gaps beyond this clamp
TIME_GAP_MAX_EXTRA = 28.0              # at most one extra row height

LANE_COLORS = [
    (0.357, 0.608, 0.835, 1.0),  # blue
    (0.455, 0.781, 0.502, 1.0),  # green
    (0.918, 0.620, 0.302, 1.0),  # orange
    (0.678, 0.498, 0.839, 1.0),  # purple
    (0.870, 0.800, 0.333, 1.0),  # yellow
    (0.369, 0.788, 0.788, 1.0),  # cyan
    (0.882, 0.420, 0.420, 1.0),  # red
    (0.710, 0.620, 0.894, 1.0),  # lavender
]


@dataclass(frozen=True)
class GraphEdge:
    child_row: int
    child_lane: int
    parent_row: int
    parent_lane: int
    travel_lane: int


@dataclass
class GraphLayout:
    lanes: list[int] = field(default_factory=list)       # lane per row
    edges: list[GraphEdge] = field(default_factory=list)
    row_heights: list[float] = field(default_factory=list)
    row_tops: list[float] = field(default_factory=list)
    max_lane: int = 0

    @property
    def total_height(self) -> float:
        return (self.row_tops[-1] + self.row_heights[-1]) if self.row_tops else 0.0

    @staticmethod
    def build(commits: list[CommitInfo], base: float = ROW_HEIGHT
              ) -> "GraphLayout":
        layout = GraphLayout()
        n = len(commits)
        if n == 0:
            return layout

        active: list[Optional[str]] = []   # OID each lane waits for
        waiters: dict[int, list[tuple[int, int]]] = {}  # lane → [(row, lane of child)]

        def lowest_free() -> int:
            for s, v in enumerate(active):
                if v is None:
                    return s
            active.append(None)
            return len(active) - 1

        for row, commit in enumerate(commits):
            oid = commit.oid
            waiting = [s for s, v in enumerate(active) if v == oid]
            if waiting:
                lane = waiting[0]  # leftmost waiting lane is reused
                for s in waiting:
                    for crow, clane in waiters.pop(s, []):
                        layout.edges.append(GraphEdge(crow, clane, row, lane, s))
                    active[s] = None
            else:
                lane = lowest_free()
            layout.lanes.append(lane)
            layout.max_lane = max(layout.max_lane, lane)

            if commit.is_synthetic or not commit.parents:
                continue
            for j, parent in enumerate(commit.parents):
                existing = next((s for s, v in enumerate(active) if v == parent), None)
                if existing is not None:
                    # Join the already-waiting line (its travel lane).
                    waiters[existing].append((row, lane))
                elif j == 0:
                    # First parent inherits the commit's lane.
                    active[lane] = parent
                    waiters[lane] = [(row, lane)]
                else:
                    # Merge parents get fresh lanes.
                    s = lowest_free()
                    active[s] = parent
                    waiters[s] = [(row, lane)]

        layout.edges.sort(key=lambda e: (e.child_row, e.parent_row))
        layout.row_heights = compute_row_heights(
            [c.timestamp for c in commits], base=base)
        y = 0.0
        for h in layout.row_heights:
            layout.row_tops.append(y)
            y += h
        return layout

    def lane_x(self, lane: int) -> float:
        return (min(lane, MAX_VISIBLE_LANES - 1) + 0.5) * LANE_WIDTH

    def row_center_y(self, row: int) -> float:
        return self.row_tops[row] + self.row_heights[row] * 0.5

    def graph_width(self) -> float:
        """Adaptive width capped at MAX_VISIBLE_LANES (reference caps at 6)."""
        return (min(self.max_lane, MAX_VISIBLE_LANES - 1) + 1) * LANE_WIDTH


def compute_row_heights(timestamps: list[int], base: float = ROW_HEIGHT) -> list[float]:
    """Time-spaced row heights (reference: commit_graph.rs:486): the gap
    above each row grows with the log of the time delta to the previous
    (newer) commit — 2 h base, 30-day saturation, at most one extra row
    height — and is integer-rounded so vector assets tile without seams
    (the MSDF-tiling constraint the reference's vector_smoke test guards).
    `base` carries the Row Size setting (Normal 28 px / Large 42 px,
    reference README.md:117); the extra-gap cap scales with it so large
    rows keep the same visual rhythm."""
    if not timestamps:
        return []
    heights = [float(base)]
    extra_max = TIME_GAP_MAX_EXTRA * (base / ROW_HEIGHT)
    span = np.log(TIME_GAP_SATURATION_SECS) - np.log(TIME_GAP_BASE_SECS)
    for i in range(1, len(timestamps)):
        delta = max(0, timestamps[i - 1] - timestamps[i])
        if delta <= TIME_GAP_BASE_SECS:
            extra = 0.0
        else:
            frac = (np.log(min(delta, TIME_GAP_SATURATION_SECS))
                    - np.log(TIME_GAP_BASE_SECS)) / span
            extra = float(frac) * extra_max
        heights.append(float(round(base + extra)))
    return heights


@dataclass(frozen=True)
class RowSegment:
    """One per-row paint primitive for the graph cell."""

    kind: str   # "vline" | "cubic" | "node"
    row: int
    lane: int   # travel lane — picks the color
    # vline: (x, y0, y1); cubic: ((x,y) × 4); node: (cx, cy)
    data: tuple


def decompose_edges(layout: GraphLayout) -> list[RowSegment]:
    """Per-row paint geometry (reference: decompose_edge_into_rows,
    commit_graph.rs:525): vertical runs down the travel lane, plus one
    S-curve in the child row when the edge forks out of the child's lane
    and/or one in the parent row when it merges into a different lane.
    All curves are produced in one batched ops.bezier call (host numpy —
    control-plane math stays off the device tunnel)."""
    from . import bezier

    segments: list[RowSegment] = []
    curve_req: list[tuple[int, int, float, float, float, float]] = []
    # (row, travel_lane, x0, y0, x1, y1)

    for e in layout.edges:
        t = e.travel_lane
        xt = layout.lane_x(t)
        # Top: from the child's node into the travel lane.
        if e.child_lane != t:
            y0 = layout.row_center_y(e.child_row)
            y1 = layout.row_tops[e.child_row] + layout.row_heights[e.child_row]
            if e.parent_row == e.child_row + 1 and e.parent_lane == t:
                y1 = layout.row_center_y(e.parent_row)
            curve_req.append((e.child_row, t, layout.lane_x(e.child_lane), y0, xt, y1))
            v_start = y1
        else:
            v_start = layout.row_center_y(e.child_row)
        # Bottom: from the travel lane into the parent's node.
        # (Currently unreachable — see module docstring — kept so a
        # future allocator that parks parents off the travel lane still
        # renders correctly instead of silently drawing a gap.)
        if e.parent_lane != t:
            y1 = layout.row_center_y(e.parent_row)
            y0 = layout.row_tops[e.parent_row]
            curve_req.append((e.parent_row, t, xt, y0,
                              layout.lane_x(e.parent_lane), y1))
            v_end = y0
        else:
            v_end = layout.row_center_y(e.parent_row)
        # Vertical run down the travel lane, split per row for seam-free
        # integer tiling (the vector_smoke constraint).
        if v_end > v_start:
            row = e.child_row
            while row <= e.parent_row and layout.row_tops[row] + layout.row_heights[row] <= v_start:
                row += 1
            while row <= e.parent_row:
                top = max(v_start, layout.row_tops[row])
                bot = min(v_end, layout.row_tops[row] + layout.row_heights[row])
                if bot > top:
                    segments.append(RowSegment("vline", row, t, (xt, top, bot)))
                if layout.row_tops[row] + layout.row_heights[row] >= v_end:
                    break
                row += 1

    if curve_req:
        # Host numpy: control-plane math (a few hundred curves) must not
        # ride the device tunnel — see ops/bezier.py namespace rule.
        x0 = np.array([c[2] for c in curve_req], np.float32)
        y0 = np.array([c[3] for c in curve_req], np.float32)
        x1 = np.array([c[4] for c in curve_req], np.float32)
        y1 = np.array([c[5] for c in curve_req], np.float32)
        cubics = bezier.s_curve(x0, y0, x1, y1)
        for i, (row, lane, *_rest) in enumerate(curve_req):
            segments.append(RowSegment("cubic", row, lane,
                                       tuple(map(tuple, cubics[i]))))

    for row, lane in enumerate(layout.lanes):
        segments.append(RowSegment(
            "node", row, lane,
            (layout.lane_x(lane), layout.row_center_y(row))))
    return segments
