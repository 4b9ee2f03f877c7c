"""Mosaic compose kernel — the steady-state frame blend as ONE pallas
pass over output tiles.

The XLA compose blend (render/compose.py `_compose_frame`) is a chain of
full-frame elementwise blends + dynamic-slice gathers; XLA fuses the
elementwise segments but still (a) reads full-frame transparency for
every layer whose ink is small, (b) pays a slow unaligned gather per
slab crop, and (c) re-traverses the output around every region update.
Measured on hardware that floor sits ~3× above HBM bandwidth.

This kernel makes the blend ink-proportional AND single-pass:

  * Grid = output tiles (the rasterizer's 64×128 planar tiling). Every
    cached layer stays in the rasterizer's native planar form
    (Ty, Tx, 4, TILE_H, TILE_W), cropped to its ink's TILE RECT and
    quantized to i16 fixed-point (2^-15 step ≈ 0.004 u8 — Mosaic has
    no f16; i16 halves HBM reads with BETTER precision than the XLA
    path's f16 caches). The `assemble_f32` transpose disappears from
    the cached path.
  * Each op's BlockSpec `index_map` subtracts the op's static tile
    offset (clamped at the edges); a traced `covered` predicate skips
    ops whose rect doesn't cover the tile, so both the COPY (index
    unchanged → Mosaic skips it) and the real cost are proportional to
    ink.
  * Slab crops (scroll windows) read their dynamic row start from a
    SCALAR-PREFETCH array: two vertically-adjacent tile-row refs are
    block-indexed `r0+i` / `r0+i+1` (block height 1 keeps arbitrary row
    starts legal) and the kernel re-aligns rows with one sublane
    `pltpu.roll` — no XLA gather at all. The y clip becomes a per-row
    iota mask; the x clip is baked into slab pixels at build.
  * Blend order is the plan's z order — a static Python loop unrolled
    into the kernel body, exactly `_compose_frame`'s op sequence.

Output is planar u8 tiles quantized in-kernel; `assemble_u8`
(pallas_raster) lays out the final (H, W, 4) frame as a pure
transpose. Numerics match the XLA path: cached layers at ≤ f16 error,
f32 accumulate, one quantize — the compose pipeline's ≤1 u8 contract
holds (tests/test_compose.py, tests/test_tpu_hw.py).

Reference analog: the aetna renderer's swapchain composite — here
designed for the TPU memory system instead (HBM-bandwidth-bound tile
pass; /root/reference/docs/render_engine.md)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterizer import TILE_H, TILE_W


_I16_INV = 1.0 / 32767.0   # render/compose.py _I16_SCALE


def _to_f32(block):
    """Planar (4, TH, TW) block → f32, dequantizing i16 fixed-point
    cached layers (Mosaic has no f16; caches store i16 at 2^-15 step)."""
    if block.dtype == jnp.int16:
        return block.astype(jnp.float32) * _I16_INV
    return block.astype(jnp.float32)


def _over_tile(acc, src, ymask=None):
    """Premultiplied `over` of one planar (4, TH, TW) f32 src onto acc."""
    a = src[3]
    if ymask is not None:
        a = a * ymask
        src = src * ymask[None]
    return src + acc * (1.0 - a)[None]


@functools.partial(
    jax.jit,
    static_argnames=("ops", "tiles_y", "tiles_x", "background",
                     "interpret"))
def compose_tiles(starts, images, slabs, dyns, *, ops: tuple,
                  tiles_y: int, tiles_x: int, background: tuple,
                  interpret: bool = False):
    """Blend the plan's layers over a background → (T, 4, TH, TW) u8
    planar tiles (quantized in-kernel; `assemble_u8` lays out the
    frame).

    starts: (n_slabs,) i32 pixel row start per slab crop (scroll).
    images: tuple of (Ty, Tx, 4, TH, TW) i16 tile-rect chrome layers.
    slabs:  tuple of (Rt, Tx, 4, TH, TW) i16 full-width slab tiles.
    dyns:   dict (li, ci) -> (Ty, ts, 4, TH, TW) f32 volatile tiles.
    ops:    z-ordered tuple of
              ("img", i, ty0, tx0)      tile offset of the crop
              ("slab", j, clip)         y clip (x baked in pixels)
              ("dyn", li, ci, c0)       volatile tail, tile column c0
    (all offsets static — index maps must not capture tracers).

    Grid = one step per 64×128 output tile. A row-block variant (one
    step per tile ROW) was measured SLOWER on hardware — the full-row
    slab re-alignment roll outweighs the amortized per-step overhead —
    so the per-tile grid stands."""
    tensor_inputs, in_specs = [], []

    def add_input(arr, index_map):
        tensor_inputs.append(arr)
        in_specs.append(pl.BlockSpec((1, 1, 4, TILE_H, TILE_W),
                                     index_map))
        return len(tensor_inputs) - 1

    body_plan = []  # (kind, ref index/aux, static data)
    for op in ops:
        if op[0] == "img":
            _, i, ty0, tx0 = op
            img = images[i]
            ty_n, tx_n = img.shape[0], img.shape[1]

            def imap(i_, j_, s_, ty0=ty0, tx0=tx0, ty_n=ty_n,
                     tx_n=tx_n):
                del s_
                return (jnp.clip(i_ - ty0, 0, ty_n - 1),
                        jnp.clip(j_ - tx0, 0, tx_n - 1), 0, 0, 0)

            pos = add_input(img, imap)
            body_plan.append(("img", pos, (ty0, tx0, ty_n, tx_n)))
        elif op[0] == "slab":
            _, j, clip = op
            slab = slabs[j]
            rt = slab.shape[0]

            def imap_a(i_, j_, s_, j0=j, rt=rt):
                return (jnp.clip(s_[j0] // TILE_H + i_, 0, rt - 1),
                        j_, 0, 0, 0)

            def imap_b(i_, j_, s_, j0=j, rt=rt):
                return (jnp.clip(s_[j0] // TILE_H + i_ + 1, 0, rt - 1),
                        j_, 0, 0, 0)

            pa = add_input(slab, imap_a)
            pb = add_input(slab, imap_b)
            body_plan.append(("slab", (pa, pb),
                              (j, float(clip[1]), float(clip[3]))))
        else:
            dimg = dyns.get((op[1], op[2]))
            if dimg is None:
                continue
            c0 = op[3]
            ts = dimg.shape[1]

            def imap(i_, j_, s_, c0=c0, ts=ts):
                del s_
                return (i_, jnp.clip(j_ - c0, 0, ts - 1), 0, 0, 0)

            pos = add_input(dimg, imap)
            body_plan.append(("dyn", pos, (c0, ts)))

    n_in = len(tensor_inputs)

    def kernel(starts_ref, *refs):
        tn = refs[:n_in]
        out_ref = refs[n_in]
        i = pl.program_id(0)
        j = pl.program_id(1)
        # Pixel-center row coordinates of this tile (for slab y clips).
        # Mosaic iota is integer-only; cast after.
        rows = (jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
            + ((i * TILE_H).astype(jnp.float32) + 0.5))
        acc = jnp.stack([
            jnp.full((TILE_H, TILE_W), background[0], jnp.float32),
            jnp.full((TILE_H, TILE_W), background[1], jnp.float32),
            jnp.full((TILE_H, TILE_W), background[2], jnp.float32),
            jnp.ones((TILE_H, TILE_W), jnp.float32)])
        for kind, pos, aux in body_plan:
            if kind == "img":
                ty0, tx0, ty_n, tx_n = aux
                covered = ((i >= ty0) & (i < ty0 + ty_n)
                           & (j >= tx0) & (j < tx0 + tx_n))
                src = _to_f32(tn[pos][0, 0])
                # jnp.where (not cond): both sides are a handful of VPU
                # ops; the DMA — the real cost — is already skipped by
                # the clamped index_map when the tile isn't covered.
                acc = jnp.where(covered, _over_tile(acc, src), acc)
            elif kind == "slab":
                pa, pb = pos
                j0, cy0, cy1 = aux
                start = starts_ref[j0]
                off = start % TILE_H
                both = _to_f32(jnp.concatenate(
                    [tn[pa][0, 0], tn[pb][0, 0]], axis=1))  # (4,2TH,TW)
                # Rows [off, off+TH): circular-shift up, static slice
                # (Mosaic has roll, not value dynamic_slice).
                src = pltpu.roll(both, -off, axis=1)[:, :TILE_H]
                # y clip: pixel center in [cy0, cy1] (x clip is baked
                # into the slab's pixels at build).
                ymask = ((rows >= cy0) & (rows <= cy1)
                         ).astype(jnp.float32)
                acc = _over_tile(acc, src, ymask)
            else:
                c0, ts = aux
                covered = (j >= c0) & (j < c0 + ts)
                src = _to_f32(tn[pos][0, 0])
                acc = jnp.where(covered, _over_tile(acc, src), acc)
        # Quantize in-kernel: the output is planar u8 tiles (4 MB/frame
        # instead of a 25 MB f32 intermediate + quantize pass). Mosaic
        # lacks a direct f32→u8 cast; hop through i32.
        q = jnp.clip(acc * 255.0 + 0.5, 0.0, 255.0)
        out_ref[0, 0] = q.astype(jnp.int32).astype(jnp.uint8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 4, TILE_H, TILE_W),
                               lambda i, j, s: (i, j, 0, 0, 0)),
    )
    if starts.shape[0] == 0:   # scalar-prefetch arrays must be nonempty
        starts = jnp.zeros((1,), jnp.int32)
    out5 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tiles_y, tiles_x, 4, TILE_H, TILE_W), jnp.uint8),
        interpret=interpret,
    )(starts.astype(jnp.int32), *tensor_inputs)
    return out5.reshape(tiles_y * tiles_x, 4, TILE_H, TILE_W)
