"""Fallback glyph bank (render/fallback.py): lazy out-of-coverage glyph
rasterization through a discovered font chain.

The test environment has no CJK-capable font (only DejaVu/STIX), so the
chain's load-bearing properties are exercised with codepoints DejaVu
covers but the resident atlas does not (Hebrew, box drawing, math);
CJK-specific assertions are gated on an actual CJK font being present —
exactly the reference's own behavior (cosmic-text renders tofu on a
system with no CJK font installed).
"""

import numpy as np
import pytest

# Codepoints OUTSIDE the resident atlas coverage but INSIDE DejaVu:
HEBREW = "שלום"           # U+05E9... Hebrew
BOX = "┌─┐"               # box drawing
MATH = "∮"                # contour integral U+222E


def _fresh_renderer():
    from whisper_git_tpu.render.renderer import Renderer

    return Renderer()


@pytest.fixture(scope="module")
def renderer():
    return _fresh_renderer()


def test_resident_atlas_does_not_cover_probe_glyphs(renderer):
    """Guard: if these ever enter the resident set, pick new probes."""
    for ch in HEBREW + BOX + MATH:
        assert ch not in renderer.regular.glyphs


def test_chain_discovers_dejavu():
    from whisper_git_tpu.render.fallback import discover_chain_paths

    paths = discover_chain_paths()
    assert paths, "fallback chain must never be empty (DejaVu is bundled)"
    assert any("DejaVu" in p for p in paths)


def test_ensure_rasterizes_and_registers(renderer):
    bank = renderer.fallback_bank
    cps = [ord(c) for c in HEBREW]
    assert bank.ensure(cps)
    assert bank.used
    for cp in cps:
        row = bank.metrics[cp]
        u, v = int(row[0]), int(row[1])
        assert v >= renderer.font_tex.shape[0]  # below resident rows
        # The cell actually holds ink (SDF interior values > 128).
        v_rel = v - renderer.font_tex.shape[0]
        cell = bank.texture[v_rel:v_rel + 64, u:u + 64]
        assert cell.max() > 128
    assert not bank.ensure(cps)  # idempotent


def test_measure_uses_real_advances(renderer):
    atlas = renderer.regular
    w_heb = atlas.measure(HEBREW, 14.0)
    w_qm = atlas.measure("?" * len(HEBREW), 14.0)
    assert w_heb > 0
    # Hebrew letters are narrower than '?' in DejaVu; the widths must
    # come from the bank, not the '?' fallback metrics.
    assert abs(w_heb - w_qm) > 0.5


def test_render_differs_from_question_marks(renderer):
    """End-to-end: a Hebrew string renders DIFFERENT pixels than the
    same-length '?' string (i.e. the bank cells are actually sampled)."""
    from whisper_git_tpu.ui.el import El

    def render(s):
        tree = El("stack", children=[
            El("text", text=s, font_size=20.0,
               color=(1.0, 1.0, 1.0, 1.0))])
        return np.asarray(renderer.render(tree, (256, 64)))

    img_heb = render(HEBREW)
    img_qm = render("?" * len(HEBREW))
    assert img_heb.shape == img_qm.shape
    assert (img_heb != img_qm).any()
    # And the glyphs left ink: some pixels clearly brighter than bg.
    assert (img_heb[..., :3].max(axis=-1) > 128).sum() > 50


def test_box_drawing_and_math(renderer):
    bank = renderer.fallback_bank
    cps = [ord(c) for c in BOX + MATH]
    bank.ensure(cps)
    for cp in cps:
        assert cp in bank.metrics, hex(cp)


def test_missing_coverage_marks_and_falls_back(renderer):
    """A codepoint no chain font covers renders '?' and is never
    retried."""
    bank = renderer.fallback_bank
    # U+E123: private use area — no real font maps it.
    pua = 0xE123
    bank.ensure([pua])
    assert pua in bank.missing
    assert pua not in bank.metrics
    atlas = renderer.regular
    w = atlas.measure(chr(pua), 14.0)
    assert w == pytest.approx(atlas.measure("?", 14.0), rel=1e-5)


def test_combined_texture_grows_and_versions(renderer):
    bank = renderer.fallback_bank
    tex0 = renderer.font_tex_device()
    assert tex0.shape[0] == (renderer.font_tex.shape[0]
                             + bank.texture.shape[0])
    v0 = bank.version
    bank.ensure([ord("∯")])  # another DejaVu math glyph
    assert bank.version > v0
    tex1 = renderer.font_tex_device()
    assert tex1 is not tex0  # re-uploaded after the texture write


def test_eviction_epoch_policy(renderer):
    """Slot protection is epoch-based: glyphs touched since the last
    epoch clear are NEVER recycled (cached quads may reference their
    cells); overflow defers to '?', and the next frame fires ONE
    voluntary epoch clear that frees stale slots."""
    import whisper_git_tpu.render.fallback as fb

    bank = fb.FallbackBank(capacity=12)   # one row → quick recycling
    bank.set_layout(v_base=renderer.font_tex.shape[0],
                    primary_ascent=renderer.regular.ascent)
    first = [0x05D0 + i for i in range(12)]   # fills exactly
    bank.ensure(first)
    assert bank.evictions == 0
    # Overflow while every slot is protected: DEFERRED, not recycled —
    # recycling would garble quads already emitted this frame.
    bank.ensure([0x2560])
    assert bank.evictions == 0
    assert 0x2560 not in bank.metrics
    assert 0x2560 not in bank.missing         # will retry
    assert first[0] in bank.metrics           # nothing garbled
    # The pressure fires one voluntary epoch clear on the next frame…
    bank.begin_frame()
    assert bank.evictions == 1
    # …after which stale (untouched-since-clear) slots recycle freely,
    # with NO further cache-clearing epochs.
    bank.ensure([0x2560])
    assert 0x2560 in bank.metrics
    assert bank.evictions == 1
    # Re-ensuring an evicted glyph works too.
    evicted = next(cp for cp in first if cp not in bank.metrics)
    bank.ensure([evicted])
    assert evicted in bank.metrics


def test_single_ensure_overflow_never_doubles_slots(renderer):
    """One ensure() with more new codepoints than free slots must not
    hand any slot to two codepoints (slots are reserved at take time,
    not at rasterize time)."""
    import whisper_git_tpu.render.fallback as fb

    bank = fb.FallbackBank(capacity=12)
    bank.set_layout(v_base=renderer.font_tex.shape[0],
                    primary_ascent=renderer.regular.ascent)
    bank.ensure([0x05D0 + i for i in range(30)])  # 30 new > 12 slots
    assert len(bank.metrics) == 12                # 12 landed, rest deferred
    cells = [(int(r[0]), int(r[1])) for r in bank.metrics.values()]
    assert len(set(cells)) == len(cells), "two codepoints share a cell"
    assert bank._pressure                         # deferral recorded


def test_overflow_does_not_stampede_caches(renderer):
    """A screen needing more unique glyphs than capacity must not clear
    every cache every frame: voluntary epoch clears are rate-limited
    (at most one per _CLEAR_BACKOFF frames)."""
    import whisper_git_tpu.render.fallback as fb

    bank = fb.FallbackBank(capacity=12)
    bank.set_layout(v_base=renderer.font_tex.shape[0],
                    primary_ascent=renderer.regular.ascent)
    want = [0x05D0 + i for i in range(30)]    # 30 unique > 12 slots
    for _ in range(25):                       # 25 "frames"
        bank.begin_frame()
        bank.ensure(want)
        bank.touch(want)                      # all visible every frame
    # ≤ ceil(25 / backoff) clears, not 25.
    assert bank.evictions <= 25 // bank._CLEAR_BACKOFF + 1


def test_run_template_revalidates_on_eviction(renderer):
    """A cached text template that used the bank rebuilds after an
    eviction (its quads may point at recycled cells)."""
    compiler = renderer.compiler
    atlas = renderer.regular
    bank = renderer.fallback_bank
    line = "ש test"
    t1 = compiler._run_template(atlas, line, 1.0, 0)
    t2 = compiler._run_template(atlas, line, 1.0, 0)
    assert t2 is t1                       # cache hit, no eviction
    bank.evictions += 1                   # simulate a recycle
    t3 = compiler._run_template(atlas, line, 1.0, 0)
    assert t3 is not t1                   # rebuilt
    bank.evictions -= 1


def test_bold_run_uses_bank_without_bold_offset(renderer):
    """Bank rows carry an absolute v: a bold run mixing resident and
    fallback glyphs must offset only the resident glyphs."""
    compiler = renderer.compiler
    bold = renderer.bold
    tpl = compiler._run_template(bold, "aש", 1.0, compiler.bold_v_offset)
    assert tpl.shape[0] == 2
    v_a, v_heb = tpl[0, 5], tpl[1, 5]
    # 'a' sits in the bold band; 'ש' below both resident atlases.
    assert v_a >= compiler.bold_v_offset
    assert v_a < renderer.font_tex.shape[0]
    assert v_heb >= renderer.font_tex.shape[0]


def _build_cjk_fixture_font(path: str) -> None:
    """Synthesize a minimal TTF whose cmap maps 中 (U+4E2D) and 文
    (U+6587) to simple filled outlines — the glyph SHAPES are
    placeholders, but the font exercises the exact production path a
    real Noto CJK would: env-var chain discovery → fontTools cmap
    coverage → PIL rasterization → EDT bank → sampled pixels."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    upm = 1000
    fb = FontBuilder(upm, isTTF=True)
    glyphs = [".notdef", "uni4E2D", "uni6587"]
    fb.setupGlyphOrder(glyphs)
    fb.setupCharacterMap({0x4E2D: "uni4E2D", 0x6587: "uni6587"})

    def boxy(inner: bool):
        pen = TTGlyphPen(None)
        pen.moveTo((100, 0))
        pen.lineTo((100, 700))
        pen.lineTo((900, 700))
        pen.lineTo((900, 0))
        pen.closePath()
        if inner:  # a hole, so the two "characters" differ
            pen.moveTo((300, 200))
            pen.lineTo((700, 200))
            pen.lineTo((700, 500))
            pen.lineTo((300, 500))
            pen.closePath()
        return pen.glyph()

    fb.setupGlyf({".notdef": TTGlyphPen(None).glyph(),
                  "uni4E2D": boxy(True), "uni6587": boxy(False)})
    fb.setupHorizontalMetrics({".notdef": (upm, 0),
                               "uni4E2D": (upm, 100),
                               "uni6587": (upm, 100)})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupNameTable({"familyName": "WgitCJKFixture",
                       "styleName": "Regular"})
    fb.setupPost()
    fb.save(path)


def test_cjk_chain_end_to_end_with_fixture_font(renderer, tmp_path,
                                                monkeypatch):
    """The FULL CJK path, hermetically: WGIT_FALLBACK_FONTS discovery →
    cmap coverage → rasterize → bank → rendered ink — using a
    synthesized TTF, since no real CJK font ships in CI."""
    import whisper_git_tpu.render.fallback as fb

    font_path = str(tmp_path / "cjk-fixture.ttf")
    _build_cjk_fixture_font(font_path)
    monkeypatch.setenv("WGIT_FALLBACK_FONTS", font_path)

    bank = fb.FallbackBank()
    bank.set_layout(v_base=renderer.font_tex.shape[0],
                    primary_ascent=renderer.regular.ascent)
    assert bank.ensure([0x4E2D, 0x6587])
    assert 0x4E2D in bank.metrics and 0x6587 in bank.metrics
    # Real ink in both cells, and the two glyphs differ (hole vs solid).
    def cell(cp):
        row = bank.metrics[cp]
        u = int(row[0])
        v_rel = int(row[1]) - renderer.font_tex.shape[0]
        return bank.texture[v_rel:v_rel + 64, u:u + 64]

    c1, c2 = cell(0x4E2D), cell(0x6587)
    assert c1.max() > 128 and c2.max() > 128
    assert (c1 != c2).any()
    # Advance comes from the fixture font (1000/1000 upm ≈ font size).
    adv = bank.advance(0x4E2D)
    assert adv is not None and adv > 20


def test_cjk_renders_when_font_available(renderer):
    """CJK end-to-end — runs only where a CJK-capable font exists (this
    CI image has none; documented parity delta)."""
    from whisper_git_tpu.render.fallback import discover_chain_paths
    bank = renderer.fallback_bank
    cp = ord("中")
    bank.ensure([cp])
    if cp in bank.missing:
        pytest.skip("no CJK-capable font on this system "
                    f"(chain: {len(discover_chain_paths())} fonts)")
    assert cp in bank.metrics
    from whisper_git_tpu.ui.el import El
    tree = El("stack", children=[
        El("text", text="中文提交", font_size=20.0,
           color=(1.0, 1.0, 1.0, 1.0))])
    img = np.asarray(renderer.render(tree, (256, 64)))
    assert (img[..., :3].max(axis=-1) > 128).sum() > 100


# ---------------------------------------------------------------------------
# Bidi + Arabic contextual shaping (render/shaping.py): the reference gets
# these from cosmic-text (docs/render_engine.md:104-112); the rebuild's
# transform runs at the atlas.metric_rows choke point.
# ---------------------------------------------------------------------------

ARABIC = "السلام"          # alef lam seen lam alef meem (logical)


def test_bidi_pure_rtl_reverses():
    from whisper_git_tpu.render.shaping import shape_visual

    assert shape_visual(HEBREW) == HEBREW[::-1]


def test_bidi_mixed_ltr_paragraph():
    from whisper_git_tpu.render.shaping import shape_visual

    out = shape_visual("abc " + HEBREW + " def")
    assert out == "abc " + HEBREW[::-1] + " def"


def test_arabic_joins_to_presentation_forms():
    """Hand-computed visual sequence for 'السلام': isolated meem is
    visually leftmost; lam+alef fused to the FINAL lam-alef ligature;
    seen medial; lam initial; leading alef isolated (visually
    rightmost)."""
    from whisper_git_tpu.render.shaping import shape_visual

    assert [hex(ord(c)) for c in shape_visual(ARABIC)] == [
        "0xfee1",   # meem isolated
        "0xfefc",   # lam-alef ligature, final
        "0xfeb4",   # seen medial
        "0xfedf",   # lam initial
        "0xfe8d",   # alef isolated
    ]


def test_digits_stay_ltr_inside_rtl():
    from whisper_git_tpu.render.shaping import shape_visual

    out = shape_visual("صفحة 123")
    # European digits keep LTR order and land visually left of the word.
    assert out.index("1") < out.index("2") < out.index("3")
    assert out.index("3") < out.index("ﺔ")  # teh marbuta final


def test_mirroring_in_rtl_runs():
    from whisper_git_tpu.render.shaping import shape_visual

    out = shape_visual("(" + HEBREW + ")")
    # The logical opening paren lands visually RIGHT, mirrored — so the
    # visual string still reads '(' ... ')' left to right.
    assert out[0] == "(" and out[-1] == ")"
    assert out[1:-1] == HEBREW[::-1]


def test_combining_marks_follow_base_after_reversal():
    from whisper_git_tpu.render.shaping import shape_visual

    s = "בְד"   # bet + sheva(mark) + dalet
    out = shape_visual(s)
    # Visual: dalet, then bet with its mark still AFTER the bet in draw
    # order (zero-advance mark overlays the glyph drawn before it).
    assert [ord(c) for c in out] == [0x05D3, 0x05D1, 0x05B0]


def test_bd13_neutral_resolves_across_isolate():
    """BD13: the PDI-side half of an isolating run sequence chains back
    to the initiator's half, so the space after 'a⁧b⁩' resolves its
    neutrals against the paragraph-level L context (sos=L), not the
    isolate interior's higher level. Plain level-run resolution would
    attach the space to the following RTL word ('aש b')."""
    from whisper_git_tpu.render.shaping import shape_visual

    assert shape_visual("a⁧b⁩ ש") == "ab ש"


def test_bd13_weak_context_carries_across_isolate():
    """W2 (EN→AN after AL) must see the Arabic strong context from
    before an isolate: alef + LRI-isolated 'a' + '1' makes the digit AN,
    landing it visually leftmost in the RTL flow (UAX#9 X10 sequence
    sos=R from the paragraph level)."""
    from whisper_git_tpu.render.shaping import shape_visual

    out = shape_visual("ا⁦a⁩" + "1")
    # digit, isolated 'a', then alef (isolated presentation form).
    assert [ord(c) for c in out] == [ord("1"), ord("a"), 0xFE8D]


def test_format_controls_consumed_not_drawn():
    from whisper_git_tpu.render.shaping import shape_visual

    out = shape_visual("a‏" + HEBREW + "‎b")
    assert "‎" not in out and "‏" not in out


def test_shaped_metric_rows_and_measure_agree(renderer):
    """metric_rows is the choke point: the cps it returns ARE the visual
    sequence, and measure() totals the shaped forms' real advances."""
    from whisper_git_tpu.render.shaping import shape_visual

    atlas = renderer.regular
    rows, abs_v, cps, used, deferred = atlas.metric_rows(ARABIC)
    assert [int(c) for c in cps] == [ord(c) for c in shape_visual(ARABIC)]
    assert not deferred
    # The presentation forms rasterized through the bank (DejaVu covers
    # Forms-B) with real (non-'?') advances.
    assert used
    w_shaped = atlas.measure(ARABIC, 13.0)
    w_q = atlas.measure("?" * len(ARABIC), 13.0)
    assert w_shaped > 0 and abs(w_shaped - w_q) > 0.5


def test_rtl_elide_keeps_logical_prefix(renderer):
    atlas = renderer.regular
    long = ARABIC + " " + ARABIC + " " + ARABIC
    full_w = atlas.measure(long, 13.0)
    out = atlas.elide(long, 13.0, full_w * 0.5)
    assert out.endswith("…")
    assert atlas.measure(out, 13.0) <= full_w * 0.5 + 0.5
    # The kept part is a LOGICAL prefix (the start of the text), not a
    # visual-order slice.
    assert long.startswith(out[:-1].rstrip())


def test_golden_scene_hebrew_arabic_commit_subjects(renderer):
    """The VERDICT r3 gate: a scene with Hebrew and Arabic commit
    subjects renders in visual order with joined forms — certified at
    the emitted-glyph level (the run template's cps are the shaped
    sequence) and by ink actually landing through the full render."""
    from whisper_git_tpu.render.shaping import shape_visual
    from whisper_git_tpu.ui import column, rect, text
    from whisper_git_tpu.ui.theme import DARK as T

    subjects = ["תיקון באג בממשק", "إصلاح خلل في الواجهة", "fix: mixed "
                + HEBREW + " subject"]
    tree = column(*[text(s, color=(1, 1, 1, 1)) for s in subjects],
                  width="fill", height="fill")
    root = renderer.layout(rect(tree, fill=T.background, width=420,
                                height=90), (420, 90))
    scene = renderer.compile(root, (420, 90), T.background)
    img = np.asarray(renderer.render(
        rect(tree, fill=T.background, width=420, height=90), (420, 90)))
    assert img.shape == (90, 420, 4)
    # Ink present (not background, not all-'?' tofu): compare against a
    # '?'-only render of the same layout length.
    assert (np.abs(np.diff(img[..., :3].astype(np.int16),
                           axis=1)) > 8).sum() > 200
    # Arabic subject's emitted cps carry presentation forms.
    bank = renderer.fallback_bank
    shaped = shape_visual(subjects[1])
    assert any(0xFE70 <= ord(c) <= 0xFEFC for c in shaped)
    for c in shaped:
        if 0xFE70 <= ord(c) <= 0xFEFC:
            assert ord(c) in bank.metrics or ord(c) in bank.missing
    assert all(0xFE70 <= ord(c) <= 0xFEFC or not (0x600 <= ord(c) < 0x700)
               or ord(c) in (0x0640,)
               or unicodedata_is_mark_or_space(c)
               for c in shaped), shaped


def unicodedata_is_mark_or_space(c):
    import unicodedata

    return unicodedata.category(c) in ("Mn", "Me", "Zs")


# ---------------------------------------------------------------------------
# Weight-aware bank: bold runs get real bold faces (or a synthetic
# embolden) instead of regular-weight glyphs — closes ux-design.md's
# single-weight delta.
# ---------------------------------------------------------------------------


def test_bold_chain_prefers_real_bold_face():
    from whisper_git_tpu.render.fallback import discover_chain_paths

    chain = discover_chain_paths(bold=True)
    assert any("Bold" in p for p in chain)
    # The bold variant must rank before its regular sibling.
    bold_i = min(i for i, p in enumerate(chain) if "DejaVuSans-Bold" in p)
    reg_i = min(i for i, p in enumerate(chain)
                if p.endswith("DejaVuSans.ttf"))
    assert bold_i < reg_i


def test_bold_bank_glyphs_differ_and_are_heavier(renderer):
    """A bold Hebrew run rasterizes from DejaVuSans-Bold into its own
    bank cell; its ink coverage exceeds the regular cell's."""
    bank = renderer.fallback_bank
    cp = ord("ש")
    renderer.regular.metric_rows("ש")
    renderer.bold.metric_rows("ש")
    k_reg, k_bold = bank.key_for(cp, False), bank.key_for(cp, True)
    assert k_reg in bank.metrics and k_bold in bank.metrics
    assert k_reg != k_bold

    def cell_of(key):
        from whisper_git_tpu.render.atlas import CELL

        slot = bank._cp_slot[key]
        r, c = divmod(slot, bank.COLS)
        return bank.texture[r * CELL:(r + 1) * CELL,
                            c * CELL:(c + 1) * CELL]

    reg, bold = cell_of(k_reg), cell_of(k_bold)
    assert not np.array_equal(reg, bold)
    # SDF encoding: >=128 is inside the outline — bold has more ink.
    assert (bold >= 128).sum() > (reg >= 128).sum() * 1.05


def test_synthetic_embolden_when_no_bold_face(renderer, tmp_path,
                                              monkeypatch):
    """A chain font with no bold sibling (the synthesized CJK fixture)
    still renders bold runs heavier via coverage dilation."""
    pytest.importorskip("fontTools")
    font_path = str(tmp_path / "cjk-fixture.ttf")
    _build_cjk_fixture_font(font_path)
    monkeypatch.setenv("WGIT_FALLBACK_FONTS", font_path)
    from whisper_git_tpu.render.fallback import FallbackBank

    bank = FallbackBank(capacity=24)
    bank.set_layout(v_base=renderer.font_tex.shape[0],
                    primary_ascent=renderer.regular.ascent)
    cp = 0x4E2D
    assert bank.ensure([cp])
    assert bank.ensure([cp], bold=True)
    from whisper_git_tpu.render.atlas import CELL

    def cell_of(key):
        slot = bank._cp_slot[key]
        r, c = divmod(slot, bank.COLS)
        return bank.texture[r * CELL:(r + 1) * CELL,
                            c * CELL:(c + 1) * CELL]

    reg = cell_of(bank.key_for(cp, False))
    bold = cell_of(bank.key_for(cp, True))
    assert (bold >= 128).sum() > (reg >= 128).sum()


def test_zwnj_breaks_joining():
    """ZWNJ (class U) must break the Arabic join — ubiquitous in
    Persian. Regression: it was treated as joining-transparent."""
    from whisper_git_tpu.render.shaping import shape_visual

    out = [hex(ord(c)) for c in shape_visual("می‌خواهم")]
    assert "0xfbfd" in out or "0xfef0" in out, out   # yeh FINAL, not medial
    assert "0xfbff" not in out
    # And the ZWNJ itself is consumed, not drawn.
    assert "0x200c" not in out


def test_zwj_forces_joining():
    from whisper_git_tpu.render.shaping import shape_visual

    # heh + ZWJ: the ZWJ provides a join target → heh takes a joined form
    out = [hex(ord(c)) for c in shape_visual("ه‍ـ")]
    assert "0xfeeb" in out, out   # heh initial, not isolated 0xfee9


def test_smp_rtl_scripts_reorder():
    """Supplementary-plane RTL (Adlam) must reorder like BMP RTL."""
    from whisper_git_tpu.render.shaping import needs_shaping, shape_visual

    s = "\U0001E906\U0001E907\U0001E908"
    assert needs_shaping(s)
    assert shape_visual(s) == s[::-1]


def test_synthetic_embolden_widens_advance(renderer, tmp_path,
                                           monkeypatch):
    """The dilated ink must come with a wider advance (else consecutive
    synthetic-bold glyphs touch) — regression for the metrics gap."""
    pytest.importorskip("fontTools")
    font_path = str(tmp_path / "cjk-fixture.ttf")
    _build_cjk_fixture_font(font_path)
    monkeypatch.setenv("WGIT_FALLBACK_FONTS", font_path)
    from whisper_git_tpu.render.fallback import FallbackBank

    bank = FallbackBank(capacity=24)
    bank.set_layout(v_base=renderer.font_tex.shape[0],
                    primary_ascent=renderer.regular.ascent)
    cp = 0x4E2D
    bank.ensure([cp])
    bank.ensure([cp], bold=True)
    adv_reg = bank.metrics[bank.key_for(cp, False)][6]
    adv_bold = bank.metrics[bank.key_for(cp, True)][6]
    assert adv_bold > adv_reg


def test_explicit_directional_controls():
    """UAX#9 X rules: overrides, isolates, and FSI are honored (and the
    control characters themselves are never drawn)."""
    from whisper_git_tpu.render.shaping import shape_visual

    # RLO forces LTR text to lay out right-to-left.
    assert shape_visual("‮abc‬") == "cba"
    # RLI isolates RTL content without disturbing the LTR context.
    assert shape_visual("x ⁧אב⁩ y") == "x בא y"
    # FSI auto-detects the isolate's direction from its first strong.
    assert shape_visual("⁨אב⁩ z") == "בא z"
    # Unterminated/stray PDF/PDI are harmless no-ops.
    assert shape_visual("ab‬cd⁩א") == "abcdא"


def test_bidi_fuzz_permutation_invariant():
    """Property test: for any mix of Hebrew/Latin/digit/punct/control
    text, shape_visual emits exactly the input's non-format characters
    (as a multiset, modulo mirror-pair swaps) — no dropping, duplication
    or crash for arbitrary control nesting."""
    import random
    import unicodedata

    from whisper_git_tpu.render.shaping import _MIRROR, shape_visual

    rng = random.Random(1234)
    pool = (
        [chr(c) for c in range(0x05D0, 0x05EA)]          # Hebrew letters
        + [chr(c) for c in range(0x05B0, 0x05BD)]        # niqqud marks
        + list("abcXYZ 0123()[]{}.,:!-+$%…")
        + ["‎", "‏", "‪", "‫", "‬", "‭",
           "‮", "⁦", "⁧", "⁨", "⁩", "‌",
           "‍"]
    )
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 40)))
        out = shape_visual(s)
        want = [c for c in unicodedata.normalize("NFC", s)
                if unicodedata.category(c) != "Cf"]

        def canon(ch):
            # mirror pairs count as one equivalence class
            return chr(min(ord(ch), _MIRROR.get(ord(ch), ord(ch))))

        assert sorted(map(canon, out)) == sorted(map(canon, want)), s


def test_n0_bracket_pairing():
    """N0: a bracket pair enclosing opposite-direction content takes the
    content's direction when the preceding context agrees — '(שלום)' in
    LTR context keeps its brackets hugging the RTL word."""
    from whisper_git_tpu.render.shaping import shape_visual

    out = shape_visual("see (שלום) now")
    i, j = out.index("("), out.index(")")
    inner = out[i + 1:j]
    assert inner == "שלום"[::-1], out
    # and in the RTL paragraph case, LTR content in brackets holds too
    out2 = shape_visual("שלום (abc) עולם")
    assert "(abc)" in out2, out2


def test_paragraph_separator_terminates_state_and_order():
    """X8: a '\\n' terminates explicit directional state, and lines are
    never reordered against each other (each segment is its own UAX#9
    paragraph)."""
    from whisper_git_tpu.render.shaping import shape_visual

    assert shape_visual("‮abc\ndef") == "cba\ndef"
    assert shape_visual("שלום\nעולם") == "שלום"[::-1] + "\n" + "עולם"[::-1]
