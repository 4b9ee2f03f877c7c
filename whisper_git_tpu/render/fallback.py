"""Lazy fallback glyph bank — the system-font fallback chain.

Capability parity with the reference's text stack, which gets full-script
coverage (CJK included) from cosmic-text's system-font fallback chain
(reference: aetna-vulkano text stack, docs/render_engine.md pre-port
"cosmic-text shaping"; Cargo.lock pins cosmic-text). The resident SDF
atlas (render/atlas.py) covers ASCII/Latin/Greek/Cyrillic + UI symbols —
the VMEM-resident working set. Everything else lands here:

  * The FIRST time an out-of-coverage codepoint is measured or emitted,
    the bank walks a discovered font chain (WGIT_FALLBACK_FONTS, then
    fontconfig, then well-known CJK font paths, then DejaVu itself —
    which covers Hebrew/Arabic/Armenian/box-drawing/math far beyond the
    resident set), rasterizes the glyph through the SAME pipeline as the
    resident atlas (PIL at 2× oversample → batched exact-EDT SDF → u8
    cells), and installs it into a fixed-capacity auxiliary texture.
  * The bank texture concatenates BELOW the regular+bold atlas rows in
    the combined font texture, so the rasterizer's glyph pass (XLA and
    Pallas alike) samples it with zero new code — a bank glyph is just a
    quad whose v points past the resident rows. Capacity is FIXED at
    construction: the combined texture's shape changes exactly once
    (when the first fallback glyph appears), so steady state never
    recompiles; new glyphs are an in-place write + one device re-upload.
  * Codepoints with no coverage anywhere in the chain are remembered as
    missing and render '?' (the resident fallback), never retried.

Honest deltas vs cosmic-text (docs/parity-matrix.md): no bidi
reordering and no Arabic contextual shaping (naive LTR codepoint
rendering), and bank glyphs render at regular weight even in bold runs.
CJK — the load-bearing case (each codepoint is one glyph, no shaping) —
renders correctly whenever any CJK-capable font exists on the system.

Eviction: slots recycle round-robin past capacity; `evictions` bumps so
the scene compiler drops quad caches that may reference recycled cells
(SceneCompiler.compile checks it), while `version` bumps on every
texture write so the renderer re-uploads the device copy.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np

from .atlas import ATLAS_FONT_PX, CELL, OVERSAMPLE, SPREAD, _font_path

# Well-known CJK-capable fonts, best first. Checked for existence; the
# chain only keeps loadable fonts.
_KNOWN_FALLBACK_GLOBS = (
    "/usr/share/fonts/**/NotoSansCJK*",
    "/usr/share/fonts/**/NotoSerifCJK*",
    "/usr/share/fonts/**/SourceHanSans*",
    "/usr/share/fonts/**/WenQuanYi*",
    "/usr/share/fonts/**/wqy*",
    "/usr/share/fonts/**/DroidSansFallback*",
    "/usr/share/fonts/**/unifont*",
    "/System/Library/Fonts/PingFang.ttc",
)

# One EDT dispatch shape: new glyphs process in padded batches so the
# jitted SDF kernel compiles once, not once per distinct batch size.
_ENSURE_BATCH = 16


def _fontconfig_candidates() -> list[str]:
    """Ask fontconfig for CJK-capable fonts (best-effort; absent or
    broken fc-list just skips this tier of the chain)."""
    fc = shutil.which("fc-list")
    if fc is None:
        return []
    out: list[str] = []
    try:
        r = subprocess.run(
            [fc, "--format", "%{file}\n", ":lang=zh"],
            capture_output=True, text=True, timeout=5.0)
        out += [p for p in r.stdout.splitlines() if p.strip()]
    except (OSError, subprocess.SubprocessError):
        pass
    return out


def discover_chain_paths() -> list[str]:
    """Ordered candidate font paths for the fallback chain."""
    import glob as _glob

    paths: list[str] = []
    env = os.environ.get("WGIT_FALLBACK_FONTS", "")
    paths += [p for p in env.split(":") if p]
    paths += _fontconfig_candidates()
    for pattern in _KNOWN_FALLBACK_GLOBS:
        paths += sorted(_glob.glob(pattern, recursive=True))
    # DejaVu last: not CJK, but covers Hebrew/Arabic/Armenian/Georgian/
    # box-drawing/math — the long non-CJK tail the resident atlas skips.
    paths.append(_font_path(bold=False))
    seen: set[str] = set()
    out = []
    for p in paths:
        if p not in seen and os.path.isfile(p):
            seen.add(p)
            out.append(p)
    return out


class _ChainFont:
    """One loaded chain entry: PIL face + fontTools cmap coverage set."""

    def __init__(self, path: str):
        from fontTools.ttLib import TTFont
        from PIL import ImageFont

        self.path = path
        # fontNumber=0 handles .ttc collections.
        kwargs = {"fontNumber": 0} if path.endswith((".ttc", ".TTC")) else {}
        tt = TTFont(path, lazy=True, **kwargs)
        self.cmap = set(tt.getBestCmap().keys())
        tt.close()
        self.pil = ImageFont.truetype(path, ATLAS_FONT_PX * OVERSAMPLE)
        self.ascent = self.pil.getmetrics()[0]

    def covers(self, cp: int) -> bool:
        return cp in self.cmap


class FallbackBank:
    """Fixed-capacity lazy glyph bank (see module docstring)."""

    COLS = 12  # same cell grid as the resident atlas → same texture width

    def __init__(self, capacity: int = 0):
        if capacity <= 0:
            capacity = int(os.environ.get("WGIT_FALLBACK_CAP", "192"))
        self.rows = max(1, -(-capacity // self.COLS))
        self.capacity = self.rows * self.COLS
        self.texture = np.zeros((self.rows * CELL, self.COLS * CELL),
                                np.uint8)
        # cp -> (u, v_ABSOLUTE, w, h, bearing_x, bearing_y, advance, 1.0)
        self.metrics: dict[int, np.ndarray] = {}
        self.missing: set[int] = set()
        self.version = 0      # texture content → device re-upload
        self.evictions = 0    # slot recycling → compiler cache drop
        self.used = False     # any glyph resident → concat the bank rows
        self._slot_cp: list[Optional[int]] = [None] * self.capacity
        self._next_slot = 0
        self._v_base: Optional[int] = None
        self._primary_ascent: Optional[float] = None  # atlas px (1×)
        self._chain: Optional[list[_ChainFont]] = None

    # -- wiring -----------------------------------------------------------

    def set_layout(self, v_base: int, primary_ascent: float) -> None:
        """v_base: first texture row of the bank within the COMBINED font
        texture (= regular rows + bold rows). primary_ascent: the
        resident atlas's ascent in atlas px — fallback glyphs align
        their BASELINE to it, so mixed-font runs sit on one line."""
        assert not self.metrics, "set_layout must precede the first ensure"
        self._v_base = v_base
        self._primary_ascent = primary_ascent

    def _load_chain(self) -> list[_ChainFont]:
        if self._chain is None:
            chain = []
            for p in discover_chain_paths():
                try:
                    chain.append(_ChainFont(p))
                except Exception:
                    continue  # unreadable/corrupt font: skip the tier
            self._chain = chain
        return self._chain

    # -- the lazy fill ----------------------------------------------------

    def ensure(self, cps) -> bool:
        """Make every codepoint in `cps` either resident or known-missing.
        Returns True when any glyph was added (texture changed)."""
        todo = [cp for cp in dict.fromkeys(int(c) for c in cps)
                if cp not in self.metrics and cp not in self.missing]
        if not todo:
            return False
        assert self._v_base is not None, "set_layout not called"
        chain = self._load_chain()
        jobs = []  # (cp, font)
        for cp in todo:
            f = next((f for f in chain if f.covers(cp)), None)
            if f is None:
                self.missing.add(cp)
            else:
                jobs.append((cp, f))
        if not jobs:
            return False
        for start in range(0, len(jobs), _ENSURE_BATCH):
            self._rasterize_batch(jobs[start:start + _ENSURE_BATCH])
        self.version += 1
        self.used = True
        return True

    def _rasterize_batch(self, jobs: list) -> None:
        """Rasterize ≤_ENSURE_BATCH glyphs through the resident atlas's
        pipeline (PIL mask → one padded batched EDT → u8 cells)."""
        os_cell = CELL * OVERSAMPLE
        pad = int(SPREAD * OVERSAMPLE)
        # Resident baseline row within a cell (oversampled): line top at
        # the spread margin + the resident ascent.
        base_row = pad + int(round(self._primary_ascent * OVERSAMPLE))

        coverages = np.zeros((_ENSURE_BATCH, os_cell, os_cell), np.float32)
        recs = []
        for bi, (cp, f) in enumerate(jobs):
            ch = chr(cp)
            mask = f.pil.getmask(ch, mode="L")
            mw, mh = mask.size
            bbox = f.pil.getbbox(ch)
            adv = f.pil.getlength(ch)
            if mw > 0 and mh > 0:
                arr = np.asarray(mask, np.float32).reshape(mh, mw) / 255.0
                # Baseline alignment across fonts: the glyph's ink top is
                # bbox[1] below ITS font's line top, i.e. bbox[1]-ascent
                # relative to the baseline; place it so baselines match
                # the resident atlas's.
                row0 = base_row + (bbox[1] - f.ascent)
                row0 = int(np.clip(row0, 0, os_cell - 1))
                cw = min(mw, os_cell - 2 * pad)
                chh = min(mh, os_cell - row0)
                coverages[bi, row0:row0 + chh, pad:pad + cw] = \
                    arr[:chh, :cw]
            recs.append((cp, mw, mh, bbox[0], adv))

        import jax.numpy as jnp

        from ..ops.sdf import sdf_to_u8, signed_distance_field_batch

        sdf = signed_distance_field_batch(jnp.asarray(coverages),
                                          max_dist=SPREAD * OVERSAMPLE)
        enc = np.asarray(sdf_to_u8(sdf / OVERSAMPLE, spread=SPREAD))
        enc_small = enc[:, ::OVERSAMPLE, ::OVERSAMPLE]

        pad_small = int(SPREAD)
        for bi, (cp, mw, mh, bx0, adv) in enumerate(recs):
            slot = self._take_slot()
            r, c = divmod(slot, self.COLS)
            u, v_rel = c * CELL, r * CELL
            self.texture[v_rel:v_rel + CELL, u:u + CELL] = enc_small[bi]
            self._slot_cp[slot] = cp
            self.metrics[cp] = np.array(
                [u, self._v_base + v_rel,
                 min(mw // OVERSAMPLE + 2 * pad_small, CELL),
                 min(mh // OVERSAMPLE + 2 * pad_small, CELL),
                 bx0 / OVERSAMPLE - pad_small,
                 -float(pad_small),
                 adv / OVERSAMPLE, 1.0], np.float32)

    def _take_slot(self) -> int:
        slot = self._next_slot % self.capacity
        self._next_slot += 1
        old = self._slot_cp[slot]
        if old is not None:
            # Recycling: quads cached anywhere may still point at this
            # cell — the compiler drops its caches when evictions moves.
            del self.metrics[old]
            self._slot_cp[slot] = None
            self.evictions += 1
        return slot

    # -- queries ----------------------------------------------------------

    def advance(self, cp: int) -> Optional[float]:
        row = self.metrics.get(cp)
        return None if row is None else float(row[6])
