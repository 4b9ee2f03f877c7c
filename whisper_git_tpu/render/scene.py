"""Scene compiler: laid-out El tree → static-shape draw-command buffers.

Mirrors the reference's render architecture (reference:
docs/render_engine.md "Render Loop" — three layers, each drawn as
splines → avatars → text): direct children of the root `stack` become
layers; within a layer the rasterizer composites shapes (rects+segments),
then images, then glyphs, so chrome backgrounds cover lower-layer text
while text always tops its own layer.

All buffers are padded to bucketed capacities so jit signatures stay
stable across frames (XLA static shapes), and every command carries its
inherited clip rect.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ui.el import El
from ..ui.layout import LayoutNode, TextMeasurer, _wrap_lines
from .atlas import FontAtlas

MAX_LAYERS = 4
_NOCLIP = (-1e6, -1e6, 2e6, 2e6)

# Shape command columns.
S_TYPE, S_A, S_B, S_C, S_D, S_R, S_BW = range(7)
S_FILL = 7   # 7-10 fill rgba
S_BORD = 11  # 11-14 border rgba


def _bucket(n: int) -> int:
    from .rasterizer import _coarse_buckets

    ladder = ((256, 4096, 65536) if _coarse_buckets()
              else (64, 256, 1024, 4096, 16384, 65536))
    for b in ladder:
        if n <= b:
            return b
    return ((n + 4095) // 4096) * 4096


@dataclass
class LayerBuffers:
    shapes: np.ndarray      # (NS, 16) f32
    shape_clips: np.ndarray  # (NS, 4)
    n_shapes: int
    glyphs: np.ndarray      # (NG, 8) x,y,w,h,u,v,uw,uh
    glyph_colors: np.ndarray  # (NG, 4)
    glyph_clips: np.ndarray  # (NG, 4)
    n_glyphs: int
    images: np.ndarray      # (NI, 8) x,y,w,h,u,v,uw,uh
    image_clips: np.ndarray  # (NI, 4)
    n_images: int


@dataclass
class Scene:
    layers: list[LayerBuffers]
    width: int
    height: int
    background: tuple
    image_atlas: np.ndarray  # (AH, AW, 4) u8
    stats: dict = field(default_factory=dict)


class _LayerAccum:
    def __init__(self):
        self.shapes: list[list[float]] = []
        self.shape_clips: list[tuple] = []
        # Glyphs accumulate as numpy chunks (one per text run) — the hot
        # path; per-char Python appends were a top frame cost.
        self.glyph_chunks: list[np.ndarray] = []        # (n, 8)
        self.glyph_color_chunks: list[np.ndarray] = []  # (n, 4)
        self.glyph_clip_chunks: list[np.ndarray] = []   # (n, 4)
        self.images: list[list[float]] = []
        self.image_clips: list[tuple] = []

    @property
    def n_glyphs(self) -> int:
        return sum(c.shape[0] for c in self.glyph_chunks)

    def rect(self, x, y, w, h, radius, fill, border, border_w, clip):
        f = fill or (0, 0, 0, 0)
        b = border or (0, 0, 0, 0)
        self.shapes.append([0.0, x, y, w, h, radius, border_w if border else 0.0,
                            f[0], f[1], f[2], f[3] if len(f) > 3 else 1.0,
                            b[0], b[1], b[2], b[3] if len(b) > 3 else 1.0, 0.0])
        self.shape_clips.append(clip)

    def segment(self, x0, y0, x1, y1, width, color, clip):
        c = color
        self.shapes.append([1.0, x0, y0, x1, y1, width * 0.5, 0.0,
                            c[0], c[1], c[2], c[3] if len(c) > 3 else 1.0,
                            0, 0, 0, 0, 0.0])
        self.shape_clips.append(clip)

    def glyph_run(self, quads: np.ndarray, color, clip):
        """quads: (n, 8) x,y,w,h,u,v,uw,uh for one text run."""
        n = quads.shape[0]
        if n == 0:
            return
        self.glyph_chunks.append(quads.astype(np.float32, copy=False))
        self.glyph_color_chunks.append(
            np.broadcast_to(np.asarray(color, np.float32), (n, 4)))
        self.glyph_clip_chunks.append(
            np.broadcast_to(np.asarray(clip, np.float32), (n, 4)))

    def image(self, x, y, w, h, u, v, uw, uh, clip):
        self.images.append([x, y, w, h, u, v, uw, uh])
        self.image_clips.append(clip)


def _cubic_points(p0, p1, p2, p3, n=10):
    t = np.linspace(0.0, 1.0, n + 1)[:, None]
    p0, p1, p2, p3 = map(np.asarray, (p0, p1, p2, p3))
    mt = 1 - t
    return (mt ** 3 * p0 + 3 * mt ** 2 * t * p1
            + 3 * mt * t ** 2 * p2 + t ** 3 * p3)


class SceneCompiler:
    """Compiles layout trees into Scenes. Holds the font atlases and an
    avatar/image atlas (512×512, 8×8 grid of 64² tiles — reference:
    render_engine.md AvatarRenderer) that persists across frames."""

    IMG_TILE = 64
    IMG_GRID = 8

    def __init__(self, regular: FontAtlas, bold: FontAtlas,
                 bold_v_offset: int = 0):
        self.regular = regular
        self.bold = bold
        # Bold glyph rows sit below the regular rows in the combined texture.
        self.bold_v_offset = bold_v_offset
        n = self.IMG_GRID * self.IMG_TILE
        self.image_atlas = np.zeros((n, n, 4), np.uint8)
        self._image_slots: dict[int, int] = {}  # id(array) -> slot
        self._next_slot = 0
        self.atlas_version = 0  # bumped on writes so device copies refresh
        self._text_cache: dict = {}  # (line, scale, v_off) -> quad template

    # -- image atlas --------------------------------------------------------

    def _slot_for_image(self, data: np.ndarray) -> tuple[int, int]:
        key = id(data)
        slot = self._image_slots.get(key)
        if slot is None:
            slot = self._next_slot % (self.IMG_GRID * self.IMG_GRID)
            self._next_slot += 1
            self._image_slots[key] = slot
            tile = np.asarray(data)
            if tile.shape[:2] != (self.IMG_TILE, self.IMG_TILE):
                from ..ops.image import resize_lanczos
                tile = resize_lanczos(tile, self.IMG_TILE, self.IMG_TILE)
            if tile.shape[2] == 3:
                tile = np.concatenate(
                    [tile, np.full_like(tile[..., :1], 255)], axis=-1)
            r, c = divmod(slot, self.IMG_GRID)
            self.image_atlas[r * self.IMG_TILE:(r + 1) * self.IMG_TILE,
                             c * self.IMG_TILE:(c + 1) * self.IMG_TILE] = tile
            self.atlas_version += 1
        r, c = divmod(slot, self.IMG_GRID)
        return c * self.IMG_TILE, r * self.IMG_TILE

    # -- text ---------------------------------------------------------------

    def _emit_text(self, acc: _LayerAccum, node: LayoutNode, clip):
        el = node.el
        atlas = self.bold if el.bold else self.regular
        color = el.color or (0.973, 0.98, 0.988, 1.0)
        if el.opacity < 1.0:
            color = (*color[:3], color[3] * el.opacity)
        v_off = self.bold_v_offset if el.bold else 0
        scale = el.font_size / atlas.font_px
        lh = atlas.line_height(el.font_size)
        if el.wrap:
            lines = _wrap_lines(el.text, node.w, el.font_size, el.bold,
                                _AtlasShim(atlas))
        else:
            lines = el.text.split("\n")
        y = node.y
        for line in lines:
            if line:
                quads = self._run_template(atlas, line, scale, v_off)
                if quads.shape[0]:
                    quads = quads.copy()
                    quads[:, 0] += node.x
                    quads[:, 1] += y
                    acc.glyph_run(quads, color, clip)
            y += lh

    def _run_template(self, atlas: FontAtlas, line: str, scale: float,
                      v_off: int) -> np.ndarray:
        """Origin-relative glyph quads for a text run, memoized — the view
        rebuilds the same strings every frame, so steady state is a dict
        hit + one (n,8) copy."""
        key = (line, scale, v_off)
        tpl = self._text_cache.get(key)
        if tpl is not None:
            return tpl
        cps = atlas.codepoints(line)
        m = atlas.lut[cps]  # (n, 8): u,v,w,h,bx,by,adv,known
        adv = m[:, 6] * scale
        pens = np.concatenate(([0.0], np.cumsum(adv[:-1])))
        quads = np.empty((len(cps), 8), np.float32)
        quads[:, 0] = pens + m[:, 4] * scale
        quads[:, 1] = m[:, 5] * scale
        quads[:, 2] = m[:, 2] * scale
        quads[:, 3] = m[:, 3] * scale
        quads[:, 4] = m[:, 0]
        quads[:, 5] = m[:, 1] + v_off
        quads[:, 6] = m[:, 2]
        quads[:, 7] = m[:, 3]
        # Skip spaces/control chars; unknown codepoints already carry the
        # fallback '?' metrics from the LUT.
        tpl = np.ascontiguousarray(quads[cps > 32])
        if len(self._text_cache) > 50_000:
            self._text_cache.clear()
        self._text_cache[key] = tpl
        return tpl

    # -- walk ---------------------------------------------------------------

    def compile(self, root: LayoutNode, viewport: tuple[int, int],
                background: tuple) -> Scene:
        W, H = int(viewport[0]), int(viewport[1])
        accums = [_LayerAccum() for _ in range(MAX_LAYERS)]
        stats = {"clipped_out": 0}

        is_root_stack = root.el.kind == "stack"

        def walk(node: LayoutNode, layer: int, clip):
            el = node.el
            # Viewport/clip culling.
            cx0, cy0, cx1, cy1 = clip
            if (node.x > cx1 or node.y > cy1
                    or node.x + node.w < cx0 or node.y + node.h < cy0
                    or node.x > W or node.y > H
                    or node.x + node.w < 0 or node.y + node.h < 0):
                stats["clipped_out"] += 1
                return
            acc = accums[layer]
            if el.shadow:
                acc.rect(node.x + 3, node.y + 4, node.w, node.h,
                         el.radius + 2, (0, 0, 0, 0.35), None, 0.0, clip)
            if el.fill is not None or el.border is not None:
                fill = el.fill
                if fill is not None and el.opacity < 1.0:
                    fill = (*fill[:3], (fill[3] if len(fill) > 3 else 1.0) * el.opacity)
                acc.rect(node.x, node.y, node.w, node.h, el.radius,
                         fill, el.border, el.border_width, clip)
            if el.kind == "text" and el.text:
                self._emit_text(acc, node, clip)
            elif el.kind == "image" and el.image_data is not None:
                u, v = self._slot_for_image(el.image_data)
                acc.image(node.x, node.y, node.w, node.h,
                          u, v, self.IMG_TILE, self.IMG_TILE, clip)
            for prim in el.prims:
                self._emit_prim(acc, prim, node.x, node.y, clip)
            child_clip = clip
            if el.clip:
                child_clip = (max(cx0, node.x), max(cy0, node.y),
                              min(cx1, node.x + node.w),
                              min(cy1, node.y + node.h))
            for c in node.children:
                walk(c, layer, child_clip)

        if is_root_stack:
            if root.el.fill is not None:
                accums[0].rect(root.x, root.y, root.w, root.h, 0.0,
                               root.el.fill, None, 0.0, _NOCLIP)
            for i, child in enumerate(root.children):
                walk(child, min(i, MAX_LAYERS - 1), _NOCLIP)
        else:
            walk(root, 0, _NOCLIP)

        layers = []
        for acc in accums:
            layers.append(self._pack(acc))
        scene = Scene(layers=layers, width=W, height=H,
                      background=background, image_atlas=self.image_atlas,
                      stats=stats)
        return scene

    def _emit_prim(self, acc: _LayerAccum, prim, ox, oy, clip):
        kind = prim[0]
        if kind == "vline":
            _, x, y0, y1, w, color = prim
            acc.segment(ox + x, oy + y0, ox + x, oy + y1, w, color, clip)
        elif kind == "cubic":
            _, p0, p1, p2, p3, w, color = prim
            pts = _cubic_points(p0, p1, p2, p3, n=10) + np.array([ox, oy])
            for i in range(len(pts) - 1):
                acc.segment(pts[i][0], pts[i][1], pts[i + 1][0], pts[i + 1][1],
                            w, color, clip)
        elif kind == "circle":
            _, cx, cy, r, color = prim
            acc.rect(ox + cx - r, oy + cy - r, 2 * r, 2 * r, r,
                     color, None, 0.0, clip)

    @staticmethod
    def _pack(acc: _LayerAccum) -> LayerBuffers:
        ns, ng, ni = len(acc.shapes), acc.n_glyphs, len(acc.images)
        shapes = np.zeros((_bucket(ns), 16), np.float32)
        shape_clips = np.full((_bucket(ns), 4), _NOCLIP, np.float32)
        if ns:
            shapes[:ns] = np.asarray(acc.shapes, np.float32)
            shape_clips[:ns] = np.asarray(acc.shape_clips, np.float32)
        glyphs = np.zeros((_bucket(ng), 8), np.float32)
        glyph_colors = np.zeros((_bucket(ng), 4), np.float32)
        glyph_clips = np.full((_bucket(ng), 4), _NOCLIP, np.float32)
        if ng:
            glyphs[:ng] = np.concatenate(acc.glyph_chunks, axis=0)
            glyph_colors[:ng] = np.concatenate(acc.glyph_color_chunks, axis=0)
            glyph_clips[:ng] = np.concatenate(acc.glyph_clip_chunks, axis=0)
        images = np.zeros((_bucket(ni), 8), np.float32)
        image_clips = np.full((_bucket(ni), 4), _NOCLIP, np.float32)
        if ni:
            images[:ni] = np.asarray(acc.images, np.float32)
            image_clips[:ni] = np.asarray(acc.image_clips, np.float32)
        return LayerBuffers(shapes, shape_clips, ns, glyphs, glyph_colors,
                            glyph_clips, ng, images, image_clips, ni)


class _AtlasShim(TextMeasurer):
    def __init__(self, atlas: FontAtlas):
        self.atlas = atlas

    def width(self, s: str, size: float, bold: bool = False) -> float:
        return self.atlas.measure(s, size)

    def height(self, size: float) -> float:
        return self.atlas.line_height(size)
