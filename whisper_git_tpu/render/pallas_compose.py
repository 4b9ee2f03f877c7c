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
  * VOLATILE SHAPE TAILS (scrollbar thumbs, pulse dots, drag ghosts)
    are rasterized INLINE: the kernel runs the rasterizer's own
    `_shape_step` over scalar-prefetched per-frame bins, count-bounded
    per tile — no separate render pass, no f32 HBM round-trip. Glyph/
    image volatile classes (rare) keep a pre-rendered planar input.
  * Blend order is the plan's z order — a static Python loop unrolled
    into the kernel body, exactly `_compose_frame`'s op sequence,
    accumulating in a VMEM scratch framebuffer (the rasterizer's
    pattern) so `pl.when` also skips non-covered ops' compute.

Output is planar u8 tiles quantized in-kernel; `assemble_u8`
(pallas_raster) lays out the final (H, W, 4) frame as a pure
transpose. Numerics match the XLA path: cached layers at ≤ f16 error,
f32 accumulate, one quantize; inline tails composite directly instead
of layer-then-over, re-associating the premultiplied `over` by ≤1 ulp
— the compose pipeline's ≤1 u8 contract holds (tests/test_compose.py,
tests/test_tpu_hw.py). Measured at 1280×800: 0.16-0.17 ms/frame vs
0.32 for the best XLA schedule (docs/performance.md has the full
schedule ladder).

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


@functools.partial(
    jax.jit,
    static_argnames=("ops", "tiles_y", "tiles_x", "background",
                     "interpret", "n_rows"))
def compose_tiles(starts, images, slabs, dyns, *, ops: tuple,
                  tiles_y: int, tiles_x: int, background: tuple,
                  interpret: bool = False, n_rows: int | None = None,
                  row0=None):
    """Blend the plan's layers over a background → (T, 4, TH, TW) u8
    planar tiles (quantized in-kernel; `assemble_u8` lays out the
    frame).

    starts: (n_slabs,) i32 pixel row start per slab crop (scroll).
    images: tuple of (Ty, Tx, 4, TH, TW) i16 tile-rect chrome layers.
    slabs:  tuple of (Rt, Tx, 4, TH, TW) i16 full-width slab tiles.
    dyns:   dict (li, ci) ->
              (Ty, ts, 4, TH, TW) f32 pre-rendered volatile tiles
                (glyph/image classes), or
              (shapes f32 (cap,16), sclips f32 (cap,4),
               bins i32 (Ty*ts, k), counts i32 (Ty*ts,))
                for the INLINE shape class — rasterized right here with
                the rasterizer's own `_shape_step`, skipping the
                separate render pass + its HBM round-trip entirely.
    ops:    z-ordered tuple of
              ("img", i, ty0, tx0)       tile offset of the crop
              ("slab", j, clip)          y clip (x baked in pixels)
              ("dyn", li, ci, c0)        pre-rendered volatile tail
              ("dyni", li, ci, c0, ts)   inline shape volatile tail
    (all offsets static — index maps must not capture tracers).

    Grid = one step per 64×128 output tile, accumulating in a VMEM
    scratch framebuffer (the rasterizer's pattern) so `pl.when` skips
    BOTH the DMA (clamped index_map, unchanged index → copy skipped)
    and the blend compute for non-covered ops. A one-step-per-tile-ROW
    variant was measured SLOWER on hardware (the full-row slab
    re-alignment roll outweighs amortized step overhead).

    Under `jax.shard_map` (render/compose.py mesh branch) each device
    runs this kernel over its local contiguous TILE-ROW slice of the
    padded output grid: `n_rows` is the local row count and `row0` a
    traced i32 global tile-row offset (scalar-prefetched; index maps
    and the pixel-coordinate/covered logic all use the global row).
    Rows past tiles_y (row padding to the mesh size) quantize the bare
    background and are cropped by assemble_u8."""
    from .pallas_raster import _shape_step

    scalar_inputs = [None]   # slot 0: starts (filled at call)
    row0_slot = None
    if row0 is not None:
        row0_slot = len(scalar_inputs)
        scalar_inputs.append(
            jnp.asarray(row0, jnp.int32).reshape(1))
    tensor_inputs, in_specs = [], []

    def add_input(arr, index_map=None):
        tensor_inputs.append(arr)
        if index_map is None:   # whole array resident in VMEM
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, 1, 4, TILE_H, TILE_W),
                                         index_map))
        return len(tensor_inputs) - 1

    def add_scalar(arr):
        scalar_inputs.append(arr)
        return len(scalar_inputs) - 1

    def grow(i_, s_):
        """Global tile row from a (possibly shard-local) grid row."""
        return i_ if row0_slot is None else i_ + s_[row0_slot][0]

    body_plan = []  # (kind, ref index/aux, static data)
    for op in ops:
        if op[0] == "img":
            _, i, ty0, tx0 = op
            img = images[i]
            ty_n, tx_n = img.shape[0], img.shape[1]

            def imap(i_, j_, *s_, ty0=ty0, tx0=tx0, ty_n=ty_n,
                     tx_n=tx_n):
                return (jnp.clip(grow(i_, s_) - ty0, 0, ty_n - 1),
                        jnp.clip(j_ - tx0, 0, tx_n - 1), 0, 0, 0)

            pos = add_input(img, imap)
            body_plan.append(("img", pos, (ty0, tx0, ty_n, tx_n)))
        elif op[0] == "slab":
            _, j, clip = op
            slab = slabs[j]
            rt = slab.shape[0]

            def imap_a(i_, j_, *s_, j0=j, rt=rt):
                return (jnp.clip(s_[0][j0] // TILE_H + grow(i_, s_),
                                 0, rt - 1),
                        j_, 0, 0, 0)

            def imap_b(i_, j_, *s_, j0=j, rt=rt):
                return (jnp.clip(s_[0][j0] // TILE_H + grow(i_, s_) + 1,
                                 0, rt - 1),
                        j_, 0, 0, 0)

            pa = add_input(slab, imap_a)
            pb = add_input(slab, imap_b)
            body_plan.append(("slab", (pa, pb),
                              (j, float(clip[1]), float(clip[3]))))
        elif op[0] == "dyni":
            entry = dyns.get((op[1], op[2]))
            if entry is None:
                continue
            shapes_t, sclips_t, bins_t, counts_t = entry
            c0, ts = op[3], op[4]
            ps = add_input(shapes_t)
            pc = add_input(sclips_t)
            sb = add_scalar(bins_t)
            sn = add_scalar(counts_t)
            body_plan.append(("dyni", (ps, pc, sb, sn), (c0, ts)))
        else:
            dimg = dyns.get((op[1], op[2]))
            if dimg is None:
                continue
            c0 = op[3]
            ts = dimg.shape[1]
            ty_n = dimg.shape[0]

            def imap(i_, j_, *s_, c0=c0, ts=ts, ty_n=ty_n):
                return (jnp.clip(grow(i_, s_), 0, ty_n - 1),
                        jnp.clip(j_ - c0, 0, ts - 1), 0, 0, 0)

            pos = add_input(dimg, imap)
            body_plan.append(("dyn", pos, (c0, ts, ty_n)))

    n_in = len(tensor_inputs)
    n_scalar = len(scalar_inputs)

    def kernel(*refs):
        sc = refs[:n_scalar]
        tn = refs[n_scalar:n_scalar + n_in]
        out_ref = refs[n_scalar + n_in]
        fb = refs[n_scalar + n_in + 1]
        j = pl.program_id(1)
        # Global tile row (shard-local grid row + the shard's offset).
        if row0_slot is None:
            i = pl.program_id(0)
        else:
            i = pl.program_id(0) + sc[row0_slot][0]
        # Pixel-center coordinate grids (Mosaic iota is integer-only).
        py = (jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
            + ((i * TILE_H).astype(jnp.float32) + 0.5))
        px = (jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
            + ((j * TILE_W).astype(jnp.float32) + 0.5))
        # The accumulator carries RGB ONLY: the frame composes over an
        # OPAQUE background, so output alpha is identically 1 — the
        # alpha plane was write-only dead weight (a quarter of the
        # scratch traffic and blend FLOPs; the compose probe put the
        # empty-kernel floor at 0.113 of 0.196 ms/frame). Src alphas
        # still drive the `over` blending, of course.
        fb[0] = jnp.full((TILE_H, TILE_W), background[0], jnp.float32)
        fb[1] = jnp.full((TILE_H, TILE_W), background[1], jnp.float32)
        fb[2] = jnp.full((TILE_H, TILE_W), background[2], jnp.float32)

        def over_src(src, ymask=None):
            a = src[3]
            if ymask is not None:
                a = a * ymask
                src = src * ymask[None]
            inv = 1.0 - a
            fb[0] = src[0] + fb[0] * inv
            fb[1] = src[1] + fb[1] * inv
            fb[2] = src[2] + fb[2] * inv

        def clip_mask(c0_, c1_, c2_, c3_):
            return ((px >= c0_) & (py >= c1_) & (px <= c2_) & (py <= c3_)
                    ).astype(jnp.float32)

        def composite(r, g, b, cov_a):
            inv = 1.0 - cov_a
            fb[0] = r * cov_a + fb[0] * inv
            fb[1] = g * cov_a + fb[1] * inv
            fb[2] = b * cov_a + fb[2] * inv

        for kind, pos, aux in body_plan:
            if kind == "img":
                ty0, tx0, ty_n, tx_n = aux
                covered = ((i >= ty0) & (i < ty0 + ty_n)
                           & (j >= tx0) & (j < tx0 + tx_n))

                @pl.when(covered)
                def _(pos=pos):
                    # DMA already skipped by the clamped index_map on
                    # non-covered tiles; pl.when skips the blend too.
                    over_src(_to_f32(tn[pos][0, 0]))
            elif kind == "slab":
                pa, pb = pos
                j0, cy0, cy1 = aux
                start = sc[0][j0]
                off = start % TILE_H
                both = _to_f32(jnp.concatenate(
                    [tn[pa][0, 0], tn[pb][0, 0]], axis=1))  # (4,2TH,TW)
                # Rows [off, off+TH): circular-shift up, static slice
                # (Mosaic has roll, not value dynamic_slice; the roll
                # must happen AFTER dequant — Mosaic's rotate supports
                # 32-bit lanes only, i16 fails to compile on hw).
                src = pltpu.roll(both, -off, axis=1)[:, :TILE_H]
                # y clip: pixel center in [cy0, cy1] (x clip is baked
                # into the slab's pixels at build).
                ymask = ((py >= cy0) & (py <= cy1)).astype(jnp.float32)
                over_src(src, ymask)
            elif kind == "dyni":
                ps, pc, sb, sn = pos
                c0, ts = aux
                covered = (j >= c0) & (j < c0 + ts)
                if row0_slot is not None:
                    # Row padding to the mesh size: bins only span the
                    # real tiles_y rows.
                    covered &= i < tiles_y

                @pl.when(covered)
                def _(ps=ps, pc=pc, sb=sb, sn=sn, c0=c0, ts=ts):
                    tsub = i * ts + (j - c0)
                    shapes, sclips = tn[ps], tn[pc]
                    bins, counts = sc[sb], sc[sn]
                    # The shape/clip tables were x-translated to the
                    # tail's SUB-GRID at pack time (_compose_frame's
                    # _shift_parts by -c0*TILE_W, matching the sub-grid
                    # bins) — evaluate them against sub-grid-local
                    # pixel x, not the global px.
                    pxl = px - float(c0 * TILE_W)

                    def clip_mask_l(c0_, c1_, c2_, c3_, pxl=pxl):
                        return ((pxl >= c0_) & (py >= c1_)
                                & (pxl <= c2_) & (py <= c3_)
                                ).astype(jnp.float32)

                    def body(k, _, shapes=shapes, sclips=sclips,
                             bins=bins, tsub=tsub, pxl=pxl,
                             clip_mask_l=clip_mask_l):
                        _shape_step(shapes, sclips, bins[tsub, k],
                                    pxl, py, clip_mask_l, composite)
                        return 0

                    jax.lax.fori_loop(0, counts[tsub], body, 0)
            else:
                c0, ts, ty_n = aux
                covered = (j >= c0) & (j < c0 + ts) & (i < ty_n)

                @pl.when(covered)
                def _(pos=pos):
                    over_src(_to_f32(tn[pos][0, 0]))
        # Quantize in-kernel: the output is planar u8 tiles (4 MB/frame
        # instead of a 25 MB f32 intermediate + quantize pass). Mosaic
        # lacks a direct f32→u8 cast; hop through i32. Alpha is the
        # constant 255 (opaque background — see the RGB-only scratch).
        acc = jnp.stack([fb[0], fb[1], fb[2]])
        q = jnp.clip(acc * 255.0 + 0.5, 0.0, 255.0)
        out_ref[0, 0, :3] = q.astype(jnp.int32).astype(jnp.uint8)
        out_ref[0, 0, 3] = jnp.full((TILE_H, TILE_W), 255, jnp.uint8)

    g_rows = n_rows if n_rows is not None else tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(g_rows, tiles_x),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 4, TILE_H, TILE_W),
                               lambda i, j, *s: (i, j, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3, TILE_H, TILE_W), jnp.float32)],
    )
    if starts.shape[0] == 0:   # scalar-prefetch arrays must be nonempty
        starts = jnp.zeros((1,), jnp.int32)
    scalar_inputs[0] = starts.astype(jnp.int32)
    out5 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (g_rows, tiles_x, 4, TILE_H, TILE_W), jnp.uint8),
        interpret=interpret,
    )(*scalar_inputs, *tensor_inputs)
    return out5.reshape(g_rows * tiles_x, 4, TILE_H, TILE_W)
