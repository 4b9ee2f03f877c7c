"""Ops-layer tests: graph math (mirrors reference commit_graph.rs:1586-1763
unit tests), bezier root-find/subdivision, SDF generation, batched word
diff, Lanczos resize."""

import numpy as np
import jax.numpy as jnp

from whisper_git_tpu.gitcore.types import CommitInfo
from whisper_git_tpu.ops import bezier
from whisper_git_tpu.ops.diffword import batched_highlights
from whisper_git_tpu.ops.image import resize_lanczos
from whisper_git_tpu.ops.lanes import (
    GraphLayout,
    MAX_VISIBLE_LANES,
    ROW_HEIGHT,
    TIME_GAP_MAX_EXTRA,
    compute_row_heights,
    decompose_edges,
)
from whisper_git_tpu.ops.sdf import sdf_to_u8, signed_distance_field, u8_to_sdf


def _c(oid, parents, ts=1000):
    return CommitInfo(oid=oid * 8, short=oid[:7], summary=f"c-{oid}",
                      author_name="a", author_email="a@e", timestamp=ts,
                      parents=[p * 8 for p in parents])


# -- lane assignment --------------------------------------------------------

def test_linear_history_single_lane():
    commits = [_c("aaaaa", ["bbbbb"], 300), _c("bbbbb", ["ccccc"], 200),
               _c("ccccc", [], 100)]
    layout = GraphLayout.build(commits)
    assert layout.lanes == [0, 0, 0]
    assert layout.max_lane == 0
    assert len(layout.edges) == 2
    assert all(e.child_lane == e.parent_lane == e.travel_lane == 0
               for e in layout.edges)


def test_merge_gets_fresh_lane_and_reuse():
    # m (merge of a-line and b-line) → a → b-line in lane 1, rejoins at root.
    commits = [
        _c("mmmmm", ["aaaaa", "bbbbb"], 400),
        _c("aaaaa", ["r0000"], 300),
        _c("bbbbb", ["r0000"], 200),
        _c("r0000", [], 100),
    ]
    layout = GraphLayout.build(commits)
    assert layout.lanes[0] == 0          # merge commit in lane 0
    assert layout.lanes[1] == 0          # first parent inherits
    assert layout.lanes[2] == 1          # merge parent got fresh lane
    assert layout.lanes[3] == 0          # root lands in leftmost waiting lane
    # Edge m→b travels in lane 1 (fork-out), edge b→r merges back to lane 0.
    e_mb = next(e for e in layout.edges if e.child_row == 0 and e.parent_row == 2)
    assert e_mb.travel_lane == 1 and e_mb.child_lane == 0 and e_mb.parent_lane == 1
    # b's edge joins the already-waiting trunk lane (compact reuse): it
    # curves out of lane 1 into lane 0 right below b.
    e_br = next(e for e in layout.edges if e.child_row == 2 and e.parent_row == 3)
    assert e_br.child_lane == 1 and e_br.travel_lane == 0 and e_br.parent_lane == 0


def test_lane_freed_after_root():
    commits = [_c("aaaaa", [], 300), _c("bbbbb", [], 200)]
    layout = GraphLayout.build(commits)
    # Both are roots: second can reuse lane 0 freed by the first.
    assert layout.lanes == [0, 0]


def test_two_branches_parallel():
    commits = [
        _c("aaaaa", ["r0000"], 400),
        _c("bbbbb", ["r0000"], 300),
        _c("r0000", [], 100),
    ]
    layout = GraphLayout.build(commits)
    assert layout.lanes == [0, 1, 0]
    # b's edge joins the wait opened by a: travels down a's lane 0? No —
    # joins the *existing* wait lane 0.
    e_b = next(e for e in layout.edges if e.child_row == 1)
    assert e_b.travel_lane == 0 and e_b.parent_row == 2


def test_synthetic_rows_occupy_but_dont_connect():
    syn = CommitInfo.synthetic_for_working_dir(500)
    commits = [syn, _c("aaaaa", ["bbbbb"], 300), _c("bbbbb", [], 200)]
    layout = GraphLayout.build(commits)
    assert layout.lanes[0] == 0
    assert layout.lanes[1] == 0  # lane freed by synthetic, reused
    assert all(e.child_row != 0 for e in layout.edges)


# -- row heights ------------------------------------------------------------

def test_row_heights_time_spacing():
    now = 10_000_000
    ts = [now, now - 60, now - 60 - 3 * 86400, now - 60 - 3 * 86400 - 90 * 86400]
    hs = compute_row_heights(ts)
    assert hs[0] == ROW_HEIGHT
    assert hs[1] == ROW_HEIGHT                    # 60 s < 2 h base → no gap
    assert ROW_HEIGHT < hs[2] <= ROW_HEIGHT + TIME_GAP_MAX_EXTRA
    assert hs[3] == round(ROW_HEIGHT + TIME_GAP_MAX_EXTRA)  # ≥30 d saturates
    assert all(h == round(h) for h in hs)         # integer-rounded (tiling)


def test_row_heights_clamp_out_of_order_timestamps():
    hs = compute_row_heights([100, 200, 300])  # newer below older
    assert hs == [ROW_HEIGHT] * 3


# -- bezier -----------------------------------------------------------------

def test_bezier_t_at_y_roundtrip():
    c = bezier.s_curve(jnp.array([12.0]), jnp.array([0.0]),
                       jnp.array([36.0]), jnp.array([100.0]))
    for y in (0.0, 25.0, 50.0, 93.0, 100.0):
        t = bezier.t_at_y(c, jnp.array([y]))
        got = bezier.y_at(c, t)
        assert abs(float(got[0]) - y) < 1e-2


def test_bezier_subcurve_endpoints():
    c = bezier.s_curve(jnp.array([0.0]), jnp.array([0.0]),
                       jnp.array([10.0]), jnp.array([10.0]))
    sub = bezier.subcurve(c, jnp.array([0.25]), jnp.array([0.75]))
    p_start = bezier.point_at(c, jnp.array([0.25]))
    p_end = bezier.point_at(c, jnp.array([0.75]))
    np.testing.assert_allclose(np.asarray(sub[0, 0]), np.asarray(p_start[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sub[0, 3]), np.asarray(p_end[0]), atol=1e-4)


def test_bezier_split_continuity():
    c = bezier.s_curve(jnp.array([5.0]), jnp.array([0.0]),
                       jnp.array([20.0]), jnp.array([56.0]))
    left, right = bezier.split(c, jnp.array([0.4]))
    np.testing.assert_allclose(np.asarray(left[0, 3]), np.asarray(right[0, 0]), atol=1e-5)
    mid = bezier.point_at(c, jnp.array([0.4]))
    np.testing.assert_allclose(np.asarray(left[0, 3]), np.asarray(mid[0]), atol=1e-4)


def test_flatten_polyline():
    c = bezier.s_curve(jnp.array([0.0]), jnp.array([0.0]),
                       jnp.array([24.0]), jnp.array([28.0]))
    poly = bezier.flatten(c, segments=16)
    assert poly.shape == (1, 17, 2)
    np.testing.assert_allclose(np.asarray(poly[0, 0]), [0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(poly[0, -1]), [24, 28], atol=1e-5)


# -- edge decomposition -----------------------------------------------------

def test_decompose_same_lane_verticals():
    commits = [_c("aaaaa", ["bbbbb"], 300), _c("bbbbb", ["ccccc"], 200),
               _c("ccccc", [], 100)]
    layout = GraphLayout.build(commits)
    segs = decompose_edges(layout)
    vlines = [s for s in segs if s.kind == "vline"]
    cubics = [s for s in segs if s.kind == "cubic"]
    nodes = [s for s in segs if s.kind == "node"]
    assert len(nodes) == 3
    assert cubics == []
    assert len(vlines) >= 2
    # Verticals never cross a row boundary (per-row tiling invariant).
    for s in vlines:
        x, y0, y1 = s.data
        top = layout.row_tops[s.row]
        bottom = top + layout.row_heights[s.row]
        assert top - 1e-6 <= y0 < y1 <= bottom + 1e-6


def test_decompose_cross_lane_has_cubics():
    commits = [
        _c("mmmmm", ["aaaaa", "bbbbb"], 400),
        _c("aaaaa", ["r0000"], 300),
        _c("bbbbb", ["r0000"], 200),
        _c("r0000", [], 100),
    ]
    layout = GraphLayout.build(commits)
    segs = decompose_edges(layout)
    cubics = [s for s in segs if s.kind == "cubic"]
    assert cubics  # fork-out of the merge + merge-back to root
    for s in cubics:
        pts = s.data
        assert len(pts) == 4
        # Curve stays within its row's vertical band.
        top = layout.row_tops[s.row] - 1e-3
        bottom = top + layout.row_heights[s.row] + ROW_HEIGHT + 1e-3
        assert top <= pts[0][1] <= bottom


# -- SDF --------------------------------------------------------------------

def test_sdf_circle():
    H = W = 64
    ys, xs = np.mgrid[0:H, 0:W]
    r = np.hypot(ys - 32, xs - 32)
    coverage = (r <= 20).astype(np.float32)
    sdf = np.asarray(signed_distance_field(jnp.asarray(coverage)))
    assert sdf[32, 32] < -10          # deep inside
    assert sdf[0, 0] > 10             # far outside
    ring = np.abs(r - 20) < 1.0       # near the boundary
    assert np.abs(sdf[ring]).max() < 2.5


def test_sdf_u8_roundtrip():
    vals = jnp.array([[-8.0, -1.0, 0.0, 1.0, 8.0]])
    enc = sdf_to_u8(vals)
    dec = np.asarray(u8_to_sdf(enc))
    np.testing.assert_allclose(dec, np.asarray(vals), atol=0.08)


# -- batched word diff ------------------------------------------------------

def test_batched_highlights_matches_scalar():
    from whisper_git_tpu.gitcore.diff import intra_line_highlight
    olds = ["let x = 5;", "same", "héllo wörld", "", "abc"]
    news = ["let x = 42;", "same", "héllo wörld!", "x", "xyz"]
    batched = batched_highlights(olds, news)
    for o, n, got in zip(olds, news, batched):
        assert got == intra_line_highlight(o, n)


# -- Lanczos resize ---------------------------------------------------------

def test_resize_lanczos_shapes_and_dc():
    img = np.full((128, 128, 4), 200, np.uint8)
    out = resize_lanczos(img, 64, 64)
    assert out.shape == (64, 64, 4)
    assert np.abs(out.astype(int) - 200).max() <= 1  # DC preserved
    batch = np.stack([img, img // 2])
    outs = resize_lanczos(batch, 64, 64)
    assert outs.shape == (2, 64, 64, 4)


def test_resize_lanczos_downsample_gradient():
    x = np.linspace(0, 255, 256, dtype=np.uint8)
    img = np.repeat(x[None, :, None], 256, axis=0)[..., None]
    out = resize_lanczos(img, 64, 64)
    # Gradient preserved monotonically (allowing ringing at borders).
    mid = out[32, :, 0].astype(int)
    assert mid[5] < mid[30] < mid[58]
