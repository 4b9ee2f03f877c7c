"""Bidi reordering + Arabic contextual shaping for the text pipeline.

The reference renders RTL scripts correctly through cosmic-text's shaper
(aetna-vulkano dependency; text stack /root/reference/docs/render_engine.md:104-112).
This rebuild's renderer draws codepoints left-to-right at cumulative
advances (render/scene.py _run_template), so RTL text needs a *string →
visual string* transform before metrics/emission:

  1. **Arabic joining** (logical order): map U+0600-block letters to their
     contextual presentation forms (U+FE70–U+FEFC — a table lookup, not a
     shaper; the Forms-B block lays letters out sequentially from U+FE80,
     so the table is generated from the joining classes), including the
     four lam-alef ligatures. Persian letters use their Forms-A slots
     when the font chain covers them.
  2. **Bidi reordering** (UAX #9, implicit part): per-character classes
     from unicodedata.bidirectional, rules W1–W7, N1–N2, I1–I2, L1, and
     L2 run-reversal applied over *clusters* (base + trailing combining
     marks) so marks still follow their base in draw order. L4 mirrors
     paired punctuation in RTL runs.
  3. Format controls (Cf: LRM/RLM/ZWJ/directional embeddings…) are
     consumed, never emitted — the bank would otherwise render tofu.

Scope honestly short of a full UBA: explicit embedding/override/isolate
controls (LRE/RLO/LRI…, rules X1–X10, N0 bracket pairing) are treated as
removed format characters rather than level modifiers — commit subjects
and UI strings essentially never carry them, and first-strong paragraph
detection (P2/P3) plus the implicit rules cover real mixed-script text.

The transform is pure and memoized; `metric_rows` (render/atlas.py) is
the single choke point, so measurement, elision bounds, and emission can
never disagree about what a string shapes to.
"""

from __future__ import annotations

import functools
import unicodedata

# ---------------------------------------------------------------------------
# Fast probe: does this string contain anything RTL/Arabic/format-control?
# UI text is overwhelmingly LTR; this must be cheap per call.
# ---------------------------------------------------------------------------


def needs_shaping(s: str) -> bool:
    for ch in s:
        cp = ord(ch)
        if 0x0590 <= cp <= 0x08FF or 0xFB1D <= cp <= 0xFEFC \
                or cp in (0x200E, 0x200F, 0x061C) \
                or 0x202A <= cp <= 0x202E or 0x2066 <= cp <= 0x2069 \
                or 0x10800 <= cp <= 0x10FFF \
                or 0x1E800 <= cp <= 0x1EFFF \
                or 0x1EC70 <= cp <= 0x1EEFF:
            # Last three: supplementary-plane RTL — historic scripts
            # (Phoenician…), Adlam/Mende, Arabic Math — class R/AL per
            # unicodedata; they need the bidi pass like BMP RTL does.
            return True
    return False


# ---------------------------------------------------------------------------
# Arabic joining classes + presentation-form table.
# ---------------------------------------------------------------------------

# ArabicShaping.txt classes for U+0621–U+064A: U = non-joining,
# R = right-joining (isolated/final only), D = dual-joining.
# U+0649 (alef maksura) is nominally dual but its initial/medial forms
# live in Forms-A (U+FBE8/9, sparse font coverage) — treated as R here,
# which is also how it overwhelmingly occurs (word-final).
_CLASSES = {
    0x0621: "U", 0x0622: "R", 0x0623: "R", 0x0624: "R", 0x0625: "R",
    0x0626: "D", 0x0627: "R", 0x0628: "D", 0x0629: "R", 0x062A: "D",
    0x062B: "D", 0x062C: "D", 0x062D: "D", 0x062E: "D", 0x062F: "R",
    0x0630: "R", 0x0631: "R", 0x0632: "R", 0x0633: "D", 0x0634: "D",
    0x0635: "D", 0x0636: "D", 0x0637: "D", 0x0638: "D", 0x0639: "D",
    0x063A: "D", 0x0641: "D", 0x0642: "D", 0x0643: "D", 0x0644: "D",
    0x0645: "D", 0x0646: "D", 0x0647: "D", 0x0648: "R", 0x0649: "R",
    0x064A: "D",
}

# U+FE70+ Forms-B allocates (isolated[, final[, initial, medial]]) slots
# sequentially from U+FE80 in codepoint order: hamza 1 slot, R letters 2,
# D letters 4. Generate the form table from that layout.
_FORMS: dict = {}


def _build_forms() -> None:
    slot = 0xFE80
    for cp in range(0x0621, 0x064B):
        cls = _CLASSES.get(cp)
        if cls is None:  # 0x0640 tatweel — renders as itself, join-causing
            continue
        if cp == 0x0621:  # hamza: isolated only
            _FORMS[cp] = (slot, slot, slot, slot)
            slot += 1
        elif cls == "R":
            _FORMS[cp] = (slot, slot + 1, slot, slot + 1)
            slot += 2
        else:  # D
            _FORMS[cp] = (slot, slot + 1, slot + 2, slot + 3)
            slot += 4
    assert slot == 0xFEF5, hex(slot)  # lam-alef ligatures start here


_build_forms()

# Persian/extended letters with Forms-A contextual slots (iso, fin, ini,
# med). Only used when the font chain covers the form (see shape()'s
# `covers` parameter) — an uncovered form would render '?', worse than an
# unjoined base letter.
_FORMS_EXT = {
    0x067E: ("D", (0xFB56, 0xFB57, 0xFB58, 0xFB59)),   # peh
    0x0686: ("D", (0xFB7A, 0xFB7B, 0xFB7C, 0xFB7D)),   # tcheh
    0x0698: ("R", (0xFB8A, 0xFB8B, 0xFB8A, 0xFB8B)),   # jeh
    0x06A9: ("D", (0xFB8E, 0xFB8F, 0xFB90, 0xFB91)),   # keheh
    0x06AF: ("D", (0xFB92, 0xFB93, 0xFB94, 0xFB95)),   # gaf
    0x06CC: ("D", (0xFBFC, 0xFBFD, 0xFBFE, 0xFBFF)),   # farsi yeh
}

# Lam-alef ligatures: lam + alef-variant → (isolated, final).
_LAM_ALEF = {
    0x0622: (0xFEF5, 0xFEF6),
    0x0623: (0xFEF7, 0xFEF8),
    0x0625: (0xFEF9, 0xFEFA),
    0x0627: (0xFEFB, 0xFEFC),
}


def _join_class(cp: int, covers) -> str | None:
    """Joining class for shapable letters; None = not a shapable letter
    (but may still be join-causing or transparent — handled separately)."""
    if cp in _CLASSES:
        return _CLASSES[cp]
    ext = _FORMS_EXT.get(cp)
    if ext is not None and (covers is None or covers(ext[1][0])):
        return ext[0]
    return None


def _is_transparent(cp: int) -> bool:
    """Joining-transparent (ArabicShaping class T): combining marks take
    no part in joining. ZWNJ (U+200C, class U) and ZWJ (U+200D, class C)
    are format chars but NOT transparent — ZWNJ exists to break a join
    (ubiquitous in Persian), ZWJ to force one."""
    if cp in (0x200C, 0x200D):
        return False
    return unicodedata.combining(chr(cp)) != 0 \
        or unicodedata.category(chr(cp)) in ("Mn", "Me", "Cf")


def _joins_next(cp: int, covers) -> bool:
    """Can cp connect to the FOLLOWING letter (logical order)?"""
    if cp in (0x0640, 0x200D):  # tatweel / ZWJ: join-causing both sides
        return True
    return _join_class(cp, covers) == "D"


def _joins_prev(cp: int, covers) -> bool:
    """Can cp connect to the PRECEDING letter?"""
    if cp in (0x0640, 0x200D):
        return True
    return _join_class(cp, covers) in ("D", "R")


def _forms_for(cp: int) -> tuple | None:
    f = _FORMS.get(cp)
    if f is not None:
        return f
    ext = _FORMS_EXT.get(cp)
    return ext[1] if ext is not None else None


def arabic_join(cps: list, covers=None) -> list:
    """Replace Arabic letters with contextual presentation forms, in
    LOGICAL order (joining context is logical adjacency). `covers` is an
    optional cp→bool coverage probe: an uncovered form falls back to the
    base letter."""
    n = len(cps)
    # Previous/next non-transparent neighbor per position.
    out = []
    i = 0
    while i < n:
        cp = cps[i]
        cls = _join_class(cp, covers)
        if cls is None:
            out.append(cp)
            i += 1
            continue
        # Neighbors, skipping transparent.
        j = len(out) - 1
        prev = None
        while j >= 0:
            if not _is_transparent(out[j]):
                prev = _PREV_BASE.get(out[j], out[j])
                break
            j -= 1
        k = i + 1
        nxt = None
        while k < n:
            if not _is_transparent(cps[k]):
                nxt = cps[k]
                break
            k += 1
        linked_before = (prev is not None and _joins_next(prev, covers)
                         and _joins_prev(cp, covers))
        # Lam-alef ligature: lam directly followed (mod marks) by an
        # alef variant fuses; the ligature is final when the lam itself
        # was linked from before.
        if cp == 0x0644 and nxt in _LAM_ALEF:
            iso, fin = _LAM_ALEF[nxt]
            lig = fin if linked_before else iso
            if covers is None or covers(lig):
                out.append(lig)
                _PREV_BASE[lig] = 0x0627  # alef: right-joining terminator
                # keep marks between lam and alef, drop the alef itself
                out.extend(cps[i + 1:k])
                i = k + 1
                continue
        linked_after = (_joins_next(cp, covers) and nxt is not None
                        and _joins_prev(nxt, covers))
        forms = _forms_for(cp)
        if forms is None:
            out.append(cp)
        else:
            form = forms[(2 if linked_after else 0)
                         + (1 if linked_before else 0)]
            if covers is not None and not covers(form):
                form = cp
            out.append(form)
            _PREV_BASE[form] = cp
        i += 1
    return out


# Presentation form → base letter, for joining-context lookups on the
# already-transformed prefix. Filled lazily by arabic_join; seeded with
# every generated form so cross-call lookups stay correct.
_PREV_BASE: dict = {}
for _cp, _f in list(_FORMS.items()):
    for _slot in _f:
        _PREV_BASE[_slot] = _cp
for _cp, (_c, _f) in _FORMS_EXT.items():
    for _slot in _f:
        _PREV_BASE[_slot] = _cp
for _iso, _fin in _LAM_ALEF.values():
    # A lam-alef ligature ends in alef: right-joining for what follows.
    _PREV_BASE[_iso] = _PREV_BASE[_fin] = 0x0627


# ---------------------------------------------------------------------------
# Bidi (UAX #9 implicit rules).
# ---------------------------------------------------------------------------

_REMOVED = {"LRE", "RLE", "LRO", "RLO", "PDF", "LRI", "RLI", "FSI", "PDI"}

# L4 mirror pairs (chars with Bidi_Mirrored=Y that matter in UI text).
_MIRROR = {}
for a, b in ("()", "[]", "{}", "<>", "«»", "‹›", "≤≥"):
    _MIRROR[ord(a)] = ord(b)
    _MIRROR[ord(b)] = ord(a)


def _bidi_types(cps: list) -> list:
    types = []
    for cp in cps:
        t = unicodedata.bidirectional(chr(cp))
        if not t or t in _REMOVED:
            t = "ON"
        types.append(t)
    return types


def bidi_visual_order(cps: list) -> tuple:
    """→ (order, levels): `order` is the visual sequence of logical
    indices; `levels` the resolved embedding level per logical index."""
    n = len(cps)
    types = _bidi_types(cps)

    # P2/P3: paragraph level from the first strong character.
    para = 0
    for t in types:
        if t == "L":
            break
        if t in ("R", "AL"):
            para = 1
            break

    sos = "R" if para else "L"
    t = list(types)
    # W1: NSM takes the type of the previous character.
    prev = sos
    for i in range(n):
        if t[i] == "NSM":
            t[i] = prev
        prev = t[i]
    # W2: EN → AN when the last strong type was AL.
    strong = sos
    for i in range(n):
        if t[i] in ("L", "R", "AL"):
            strong = t[i]
        elif t[i] == "EN" and strong == "AL":
            t[i] = "AN"
    # W3: AL → R.
    t = ["R" if x == "AL" else x for x in t]
    # W4: single ES between EN→EN becomes EN; CS between same-type
    # numbers becomes that type.
    for i in range(1, n - 1):
        if t[i] == "ES" and t[i - 1] == "EN" and t[i + 1] == "EN":
            t[i] = "EN"
        elif t[i] == "CS" and t[i - 1] == t[i + 1] \
                and t[i - 1] in ("EN", "AN"):
            t[i] = t[i - 1]
    # W5: ET sequences adjacent to EN become EN.
    i = 0
    while i < n:
        if t[i] == "ET":
            j = i
            while j < n and t[j] == "ET":
                j += 1
            before = t[i - 1] if i > 0 else sos
            after = t[j] if j < n else sos
            if before == "EN" or after == "EN":
                for k in range(i, j):
                    t[k] = "EN"
            i = j
        else:
            i += 1
    # W6: stray separators/terminators → ON.
    t = ["ON" if x in ("ES", "ET", "CS") else x for x in t]
    # W7: EN → L when the last strong type was L.
    strong = sos
    for i in range(n):
        if t[i] in ("L", "R"):
            strong = t[i]
        elif t[i] == "EN" and strong == "L":
            t[i] = "L"

    # N1/N2: neutrals take the surrounding direction, else the embedding
    # direction. EN/AN count as R for this purpose.
    def _dir_of(x: str) -> str | None:
        if x == "L":
            return "L"
        if x in ("R", "EN", "AN"):
            return "R"
        return None

    e_dir = "R" if para else "L"
    i = 0
    while i < n:
        if t[i] in ("B", "S", "WS", "ON", "BN"):
            j = i
            while j < n and t[j] in ("B", "S", "WS", "ON", "BN"):
                j += 1
            before = _dir_of(t[i - 1]) if i > 0 else ("R" if para else "L")
            after = _dir_of(t[j]) if j < n else ("R" if para else "L")
            fill = before if (before == after and before is not None) \
                else e_dir
            for k in range(i, j):
                t[k] = fill
            i = j
        else:
            i += 1

    # I1/I2: resolved levels.
    levels = []
    for x in t:
        if para % 2 == 0:
            lv = 0 if x == "L" else (2 if x in ("AN", "EN") else 1)
        else:
            lv = 1 if x == "R" else 2
        levels.append(lv)
    # L1: trailing whitespace resets to the paragraph level.
    for i in range(n - 1, -1, -1):
        if types[i] in ("WS", "B", "S"):
            levels[i] = para
        else:
            break

    # Cluster L2: group base + trailing combining marks, reverse runs of
    # clusters level-by-level so marks keep following their base.
    clusters = []  # list of (level, [logical indices])
    i = 0
    while i < n:
        j = i + 1
        while j < n and unicodedata.combining(chr(cps[j])) != 0:
            j += 1
        clusters.append((levels[i], list(range(i, j))))
        i = j
    if clusters:
        max_lv = max(lv for lv, _ in clusters)
        arr = clusters
        for lv in range(max_lv, 0, -1):
            out, i = [], 0
            while i < len(arr):
                if arr[i][0] >= lv:
                    j = i
                    while j < len(arr) and arr[j][0] >= lv:
                        j += 1
                    out.extend(arr[i:j][::-1])
                    i = j
                else:
                    out.append(arr[i])
                    i += 1
            arr = out
        clusters = arr
    order = [i for _, idxs in clusters for i in idxs]
    return order, levels


# ---------------------------------------------------------------------------
# Public entry.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=65536)
def _shape_cached(s: str, covers_key: int) -> str:
    covers = _COVERS[0] if covers_key else None
    cps = [ord(c) for c in unicodedata.normalize("NFC", s)]
    cps = arabic_join(cps, covers)
    order, levels = bidi_visual_order(cps)
    out = []
    for i in order:
        cp = cps[i]
        if unicodedata.category(chr(cp)) == "Cf":
            continue  # format controls: consumed, never drawn
        if levels[i] % 2 and cp in _MIRROR:
            cp = _MIRROR[cp]  # L4
        out.append(chr(cp))
    return "".join(out)


_COVERS = [None]


def set_coverage_probe(fn) -> None:
    """Install a cp→bool probe (the renderer's font-chain coverage) used
    to gate presentation forms; invalidates the shape cache."""
    _COVERS[0] = fn
    _shape_cached.cache_clear()


def shape_visual(s: str) -> str:
    """Logical string → visual string (joined, reordered, mirrored).
    Identity for pure-LTR input; memoized (view strings recur every
    frame)."""
    if not needs_shaping(s):
        return s
    return _shape_cached(s, 1 if _COVERS[0] is not None else 0)
