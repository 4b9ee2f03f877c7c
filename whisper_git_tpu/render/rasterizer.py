"""The tile rasterizer — jitted SDF compositing (the Vulkan replacement).

Frame model (reference: docs/render_engine.md "Render Loop"): for each
layer, composite shapes (rounded-rect + capsule SDFs, analytic AA — our
replacement for 4×MSAA), then image quads (avatar atlas), then glyph quads
(SDF font atlas with screen-scale-aware smoothstep, the fwidth analog).

The framebuffer is split into (TH, TW) pixel tiles (TW = 128 to match the
TPU lane width; TH a multiple of 8 for f32 sublanes). Commands are binned
to tiles on the host; each tile folds over its command list with
`lax.scan`, so per-pixel work is pure VPU elementwise math plus small
atlas gathers. vmap over tiles gives XLA the whole frame as one fused
program; `parallel.mesh` shards the same function's tile axis across
devices.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .scene import LayerBuffers, Scene

TILE_H = 64
TILE_W = 128
K_SHAPES = 256
K_GLYPHS = 512
K_IMAGES = 32
SDF_SPREAD = 8.0  # must match atlas.SPREAD


def _bin_commands(boxes: np.ndarray, n: int, tiles_y: int, tiles_x: int,
                  k: int) -> tuple[np.ndarray, int]:
    """boxes: (N, 4) x0,y0,x1,y1. Returns (T, k) int32 index lists padded
    with -1 (in submission order), plus overflow count."""
    T = tiles_y * tiles_x
    bins = np.full((T, k), -1, np.int32)
    fill = np.zeros(T, np.int32)
    overflow = 0
    if n == 0:
        return bins[:, :8], 0
    b = boxes[:n]
    tx0 = np.clip((b[:, 0] // TILE_W).astype(int), 0, tiles_x - 1)
    ty0 = np.clip((b[:, 1] // TILE_H).astype(int), 0, tiles_y - 1)
    tx1 = np.clip((b[:, 2] // TILE_W).astype(int), 0, tiles_x - 1)
    ty1 = np.clip((b[:, 3] // TILE_H).astype(int), 0, tiles_y - 1)
    skip = (b[:, 2] < 0) | (b[:, 3] < 0) | (b[:, 0] > tiles_x * TILE_W) | (b[:, 1] > tiles_y * TILE_H)
    for i in range(n):
        if skip[i]:
            continue
        for ty in range(ty0[i], ty1[i] + 1):
            base = ty * tiles_x
            for tx in range(tx0[i], tx1[i] + 1):
                t = base + tx
                if fill[t] < k:
                    bins[t, fill[t]] = i
                    fill[t] += 1
                else:
                    overflow += 1
    # Trim to the bucketed max occupancy: the scan length is the dominant
    # per-tile cost, so don't pay for empty padded slots.
    occ = int(fill.max()) if T else 0
    k_used = 8
    while k_used < occ:
        k_used *= 2
    return bins[:, :min(k_used, k)], overflow


def _shape_boxes(shapes: np.ndarray, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros((0, 4), np.float32)
    s = shapes[:n]
    is_seg = s[:, 0] == 1.0
    pad = np.where(is_seg, s[:, 5] + 1.5, 1.5)
    x0 = np.where(is_seg, np.minimum(s[:, 1], s[:, 3]), s[:, 1]) - pad
    y0 = np.where(is_seg, np.minimum(s[:, 2], s[:, 4]), s[:, 2]) - pad
    x1 = np.where(is_seg, np.maximum(s[:, 1], s[:, 3]), s[:, 1] + s[:, 3]) + pad
    y1 = np.where(is_seg, np.maximum(s[:, 2], s[:, 4]), s[:, 2] + s[:, 4]) + pad
    return np.stack([x0, y0, x1, y1], axis=1)


def _quad_boxes(quads: np.ndarray, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros((0, 4), np.float32)
    q = quads[:n]
    return np.stack([q[:, 0], q[:, 1], q[:, 0] + q[:, 2], q[:, 1] + q[:, 3]],
                    axis=1)


# ---------------------------------------------------------------------------
# Device-side compositing.
# ---------------------------------------------------------------------------

def _over(fb, rgb, a):
    """Premultiplied 'over' composite of (rgb, a) onto fb (TH, TW, 4)."""
    a = a[..., None]
    out_rgb = rgb * a + fb[..., :3] * (1.0 - a)
    out_a = a[..., 0] + fb[..., 3] * (1.0 - a[..., 0])
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)


def _clip_mask(px, py, clip):
    return ((px >= clip[0]) & (py >= clip[1])
            & (px <= clip[2]) & (py <= clip[3])).astype(jnp.float32)


def _shapes_pass(fb, px, py, shapes, clips, bins):
    def body(fb, idx):
        i = jnp.maximum(idx, 0)
        c = shapes[i]
        valid = (idx >= 0).astype(jnp.float32)
        clip = _clip_mask(px, py, clips[i]) * valid
        is_seg = c[0] == 1.0
        # Rounded rect SDF.
        hx, hy = c[3] * 0.5, c[4] * 0.5
        cx, cy = c[1] + hx, c[2] + hy
        r = jnp.minimum(c[5], jnp.minimum(hx, hy))
        qx = jnp.abs(px - cx) - (hx - r)
        qy = jnp.abs(py - cy) - (hy - r)
        d_rect = (jnp.sqrt(jnp.maximum(qx, 0.0) ** 2 + jnp.maximum(qy, 0.0) ** 2)
                  + jnp.minimum(jnp.maximum(qx, qy), 0.0) - r)
        # Capsule SDF.
        ax, ay, bx, by = c[1], c[2], c[3], c[4]
        abx, aby = bx - ax, by - ay
        denom = jnp.maximum(abx * abx + aby * aby, 1e-6)
        t = jnp.clip(((px - ax) * abx + (py - ay) * aby) / denom, 0.0, 1.0)
        d_seg = jnp.sqrt((px - (ax + t * abx)) ** 2
                         + (py - (ay + t * aby)) ** 2) - c[5]
        d = jnp.where(is_seg, d_seg, d_rect)
        fill = c[7:11]
        cov_fill = jnp.clip(0.5 - d, 0.0, 1.0) * clip
        fb = _over(fb, fill[:3][None, None, :], cov_fill * fill[3])
        # Border ring (rects only): -bw <= d <= 0.
        bw = c[6]
        has_border = jnp.logical_and(jnp.logical_not(is_seg), bw > 0.0)
        cov_b = (jnp.clip(0.5 - d, 0.0, 1.0)
                 * jnp.clip(d + bw + 0.5, 0.0, 1.0)
                 * clip * has_border.astype(jnp.float32))
        border = c[11:15]
        fb = _over(fb, border[:3][None, None, :], cov_b * border[3])
        return fb, None

    fb, _ = jax.lax.scan(body, fb, bins)
    return fb


def _bilinear_u8(tex, fy, fx):
    """Bilinear sample of a (H, W) or (H, W, C) uint8 texture."""
    H, W = tex.shape[0], tex.shape[1]
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = jnp.clip(fx - x0, 0.0, 1.0)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    if tex.ndim == 2:
        t00 = tex[y0, x0].astype(jnp.float32)
        t01 = tex[y0, x1].astype(jnp.float32)
        t10 = tex[y1, x0].astype(jnp.float32)
        t11 = tex[y1, x1].astype(jnp.float32)
    else:
        t00 = tex[y0, x0].astype(jnp.float32)
        t01 = tex[y0, x1].astype(jnp.float32)
        t10 = tex[y1, x0].astype(jnp.float32)
        t11 = tex[y1, x1].astype(jnp.float32)
        wx = wx[..., None]
        wy = wy[..., None]
    top = t00 * (1 - wx) + t01 * wx
    bot = t10 * (1 - wx) + t11 * wx
    return top * (1 - wy) + bot * wy


def _glyphs_pass(fb, px, py, glyphs, colors, clips, bins, font_tex):
    def body(fb, idx):
        i = jnp.maximum(idx, 0)
        g = glyphs[i]
        valid = (idx >= 0).astype(jnp.float32)
        clip = _clip_mask(px, py, clips[i]) * valid
        x, y, w, h, u, v, uw, uh = (g[j] for j in range(8))
        sx = (px - x) / jnp.maximum(w, 1e-6)
        sy = (py - y) / jnp.maximum(h, 1e-6)
        inside = ((sx >= 0) & (sx < 1) & (sy >= 0) & (sy < 1)).astype(jnp.float32)
        fx = u + sx * uw
        fy = v + sy * uh
        enc = _bilinear_u8(font_tex, fy, fx)
        sdf_atlas = (128.0 - enc) * (SDF_SPREAD / 128.0)   # atlas px
        screen_scale = w / jnp.maximum(uw, 1e-6)           # screen px / atlas px
        d = sdf_atlas * screen_scale
        # smoothstep AA with ~0.7px transition (the fwidth analog).
        cov = jnp.clip(0.5 - d / 0.7, 0.0, 1.0) * inside * clip
        col = colors[i]
        fb = _over(fb, col[:3][None, None, :], cov * col[3])
        return fb, None

    fb, _ = jax.lax.scan(body, fb, bins)
    return fb


def _images_pass(fb, px, py, images, clips, bins, image_atlas):
    def body(fb, idx):
        i = jnp.maximum(idx, 0)
        g = images[i]
        valid = (idx >= 0).astype(jnp.float32)
        clip = _clip_mask(px, py, clips[i]) * valid
        x, y, w, h, u, v, uw, uh = (g[j] for j in range(8))
        sx = (px - x) / jnp.maximum(w, 1e-6)
        sy = (py - y) / jnp.maximum(h, 1e-6)
        inside = ((sx >= 0) & (sx < 1) & (sy >= 0) & (sy < 1)).astype(jnp.float32)
        fx = u + sx * uw
        fy = v + sy * uh
        rgba = _bilinear_u8(image_atlas, fy, fx) / 255.0
        a = rgba[..., 3] * inside * clip
        fb = _over(fb, rgba[..., :3], a)
        return fb, None

    fb, _ = jax.lax.scan(body, fb, bins)
    return fb


@functools.partial(
    jax.jit,
    static_argnames=("tiles_y", "tiles_x", "layer_sig"))
def _render_tiles(layer_data, font_tex, image_atlas, background,
                  tiles_y: int, tiles_x: int, layer_sig: tuple):
    """layer_data: tuple per layer of
    (shapes, shape_clips, glyphs, glyph_colors, glyph_clips, images,
     image_clips, shape_bins, glyph_bins, image_bins) — the bins are
    (T, K) and vmap over tiles; everything else is broadcast.
    Returns (T, TH, TW, 4) float32 tiles."""
    T = tiles_y * tiles_x
    tile_idx = jnp.arange(T)
    org_x = (tile_idx % tiles_x).astype(jnp.float32) * TILE_W
    org_y = (tile_idx // tiles_x).astype(jnp.float32) * TILE_H
    yy = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 1)

    bins_flat = []
    for li in range(len(layer_sig)):
        bins_flat += [layer_data[li][7], layer_data[li][8], layer_data[li][9]]

    def tile_fn(ox, oy, *tile_bins):
        px = xx + ox + 0.5
        py = yy + oy + 0.5
        fb = jnp.zeros((TILE_H, TILE_W, 4), jnp.float32)
        fb = fb.at[..., :3].set(jnp.asarray(background[:3], jnp.float32))
        fb = fb.at[..., 3].set(1.0)
        for li, (has_s, has_g, has_i) in enumerate(layer_sig):
            (shapes, shape_clips, glyphs, glyph_colors, glyph_clips,
             images, image_clips) = layer_data[li][:7]
            s_bins, g_bins, i_bins = (tile_bins[3 * li], tile_bins[3 * li + 1],
                                      tile_bins[3 * li + 2])
            if has_s:
                fb = _shapes_pass(fb, px, py, shapes, shape_clips, s_bins)
            if has_i:
                fb = _images_pass(fb, px, py, images, image_clips, i_bins,
                                  image_atlas)
            if has_g:
                fb = _glyphs_pass(fb, px, py, glyphs, glyph_colors,
                                  glyph_clips, g_bins, font_tex)
        return fb

    return jax.vmap(tile_fn)(org_x, org_y, *bins_flat)


def assemble_image(tiles: np.ndarray, tiles_y: int, tiles_x: int,
                   height: int, width: int) -> np.ndarray:
    """(T, TH, TW, 4) float → (H, W, 4) uint8."""
    t = np.asarray(tiles).reshape(tiles_y, tiles_x, TILE_H, TILE_W, 4)
    img = t.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE_H,
                                             tiles_x * TILE_W, 4)
    img = np.clip(img[:height, :width] * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return img


@dataclass
class RenderStats:
    overflow: int = 0


def render_scene(scene: Scene, font_tex: np.ndarray) -> np.ndarray:
    """Rasterize a compiled Scene → (H, W, 4) uint8."""
    tiles_x = -(-scene.width // TILE_W)
    tiles_y = -(-scene.height // TILE_H)
    layer_data = []
    layer_sig = []
    for lb in scene.layers:
        s_bins, _ = _bin_commands(_shape_boxes(lb.shapes, lb.n_shapes),
                                  lb.n_shapes, tiles_y, tiles_x, K_SHAPES)
        g_bins, _ = _bin_commands(_quad_boxes(lb.glyphs, lb.n_glyphs),
                                  lb.n_glyphs, tiles_y, tiles_x, K_GLYPHS)
        i_bins, _ = _bin_commands(_quad_boxes(lb.images, lb.n_images),
                                  lb.n_images, tiles_y, tiles_x, K_IMAGES)
        layer_data.append((
            jnp.asarray(lb.shapes), jnp.asarray(lb.shape_clips),
            jnp.asarray(lb.glyphs), jnp.asarray(lb.glyph_colors),
            jnp.asarray(lb.glyph_clips),
            jnp.asarray(lb.images), jnp.asarray(lb.image_clips),
            jnp.asarray(s_bins), jnp.asarray(g_bins), jnp.asarray(i_bins)))
        layer_sig.append((lb.n_shapes > 0, lb.n_glyphs > 0, lb.n_images > 0))
    tiles = _render_tiles(tuple(layer_data), jnp.asarray(font_tex),
                          jnp.asarray(scene.image_atlas),
                          tuple(scene.background[:3]),
                          tiles_y, tiles_x, tuple(layer_sig))
    return assemble_image(tiles, tiles_y, tiles_x, scene.height, scene.width)
