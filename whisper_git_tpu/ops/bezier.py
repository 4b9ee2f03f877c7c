"""Cubic bezier math, batched over segments (JAX).

Capability parity with the reference's `Cubic` helper
(reference: src/commit_graph.rs:614-695 — y_at, t_at_y bisection root-find,
De Casteljau split, subcurve extraction). Here every operation is
vectorized over a leading batch axis so the graph layout can decompose all
edges' curves at once; the arrays flow straight into the renderer's curve
command buffer.

Control points are (B, 4, 2) float32: P0, P1, P2, P3 in pixel space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_T_ITERS = 24  # bisection iterations: |y error| < span / 2^24 — sub-pixel


def point_at(cubics: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate (B,4,2) cubics at (B,) params → (B,2)."""
    t = t[:, None]
    mt = 1.0 - t
    p0, p1, p2, p3 = cubics[:, 0], cubics[:, 1], cubics[:, 2], cubics[:, 3]
    return (mt ** 3 * p0 + 3 * mt ** 2 * t * p1
            + 3 * mt * t ** 2 * p2 + t ** 3 * p3)


def y_at(cubics: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return point_at(cubics, t)[:, 1]


def t_at_y(cubics: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bisection root-find for the param where the curve crosses height `y`.

    Assumes y is monotonic in t (true for the graph's S-curves, which run
    top-to-bottom). (B,4,2), (B,) → (B,).
    """
    lo = jnp.zeros(cubics.shape[0], jnp.float32)
    hi = jnp.ones(cubics.shape[0], jnp.float32)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ym = y_at(cubics, mid)
        below = ym < y
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, _T_ITERS, body, (lo, hi))
    return 0.5 * (lo + hi)


def split(cubics: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """De Casteljau split at (B,) params → two (B,4,2) halves."""
    t = t[:, None, None]
    p0 = cubics[:, 0:1]
    p1 = cubics[:, 1:2]
    p2 = cubics[:, 2:3]
    p3 = cubics[:, 3:4]
    q0 = p0 + t * (p1 - p0)
    q1 = p1 + t * (p2 - p1)
    q2 = p2 + t * (p3 - p2)
    r0 = q0 + t * (q1 - q0)
    r1 = q1 + t * (q2 - q1)
    s = r0 + t * (r1 - r0)
    left = jnp.concatenate([p0, q0, r0, s], axis=1)
    right = jnp.concatenate([s, r1, q2, p3], axis=1)
    return left, right


def subcurve(cubics: jnp.ndarray, t0: jnp.ndarray, t1: jnp.ndarray) -> jnp.ndarray:
    """Extract the sub-segment [t0, t1] of each curve → (B,4,2)."""
    _, right = split(cubics, t0)
    # Re-parametrize t1 into the right half's domain.
    denom = jnp.maximum(1.0 - t0, 1e-8)
    t1r = (t1 - t0) / denom
    left, _ = split(right, t1r)
    return left


def s_curve(x0: jnp.ndarray, y0: jnp.ndarray, x1: jnp.ndarray, y1: jnp.ndarray
            ) -> jnp.ndarray:
    """The graph's merge/fork connector: a vertical-tangent S-curve between
    two lane positions (control points at 50% vertical span, matching the
    reference's smooth S-curve connectors)."""
    midy = 0.5 * (y0 + y1)
    p0 = jnp.stack([x0, y0], axis=-1)
    p1 = jnp.stack([x0, midy], axis=-1)
    p2 = jnp.stack([x1, midy], axis=-1)
    p3 = jnp.stack([x1, y1], axis=-1)
    return jnp.stack([p0, p1, p2, p3], axis=-2)


def flatten(cubics: jnp.ndarray, segments: int = 16) -> jnp.ndarray:
    """Tessellate (B,4,2) cubics into (B, segments+1, 2) polylines (the
    reference tessellates splines into 16 segments by default)."""
    ts = jnp.linspace(0.0, 1.0, segments + 1)
    B = cubics.shape[0]

    def eval_t(t):
        return point_at(cubics, jnp.full((B,), t, jnp.float32))

    pts = jax.vmap(eval_t)(ts)  # (S+1, B, 2)
    return jnp.transpose(pts, (1, 0, 2))
