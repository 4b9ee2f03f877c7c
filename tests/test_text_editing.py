"""Text-input caret editing: Left/Right/Home/End/Delete, mid-string
insert/backspace, focus-change reset, modal-form focus sync, and caret
rendering (reference README: text inputs with cursor blink; reference
text inputs support full cursor editing)."""

from whisper_git_tpu.app.repo_tab import RepoTab
from whisper_git_tpu.app.ui_app import WhisperApp
from whisper_git_tpu.ui import insert_caret


def make_app(path) -> WhisperApp:
    tab = RepoTab.open(path)
    tab.refresh_sync()
    return WhisperApp.with_tabs([tab])


def type_text(app, s):
    for ch in s:
        app.on_key(ch)


def test_insert_caret_helper():
    assert insert_caret("abc", None) == "abc▏"
    assert insert_caret("abc", 0) == "▏abc"
    assert insert_caret("abc", 2) == "ab▏c"
    assert insert_caret("abc", 99) == "abc▏"


def test_subject_mid_string_editing(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "fix bg")
    view = app.current().active_view()
    assert view.draft_subject == "fix bg"
    # "fix b|g" — Left places the caret before "g"; "u" inserts there.
    app.on_key("Left")
    assert app.input_cursor == 5
    type_text(app, "u")
    assert view.draft_subject == "fix bug"
    assert app.input_cursor == 6
    # End → cursor None (end-of-text), typing appends.
    app.on_key("End")
    assert app.input_cursor is None
    type_text(app, "!")
    assert view.draft_subject == "fix bug!"


def test_home_delete_and_backspace_mid(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "xabc")
    app.on_key("Home")
    assert app.input_cursor == 0
    app.on_key("Delete")
    view = app.current().active_view()
    assert view.draft_subject == "abc"
    # Backspace at 0 is a no-op.
    app.on_key("Backspace")
    assert view.draft_subject == "abc"
    # Right then backspace deletes the char left of the caret.
    app.on_key("Right")
    app.on_key("Backspace")
    assert view.draft_subject == "bc"
    assert app.input_cursor == 0


def test_cursor_resets_on_focus_change(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "abc")
    app.on_key("Home")
    assert app.input_cursor == 0
    app.handle_action("focus-input:body")
    assert app.input_cursor is None


def test_clone_modal_field_editing_and_focus_sync(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("open-clone-dialog")
    assert app.modal[0] == "clone"
    form = app.modal[1]
    assert app.focused_input == "url"
    type_text(app, "https://x/repo.git")
    assert form.url == "https://x/repo.git"
    # Click the dest field: typing and the caret marker both move there.
    app.handle_action("focus-input:dest")
    assert form.focused == "dest"
    type_text(app, "~/src")
    assert form.dest == "~/src"
    # Mid-string fix in the URL field.
    app.handle_action("focus-input:url")
    for _ in range(9):
        app.on_key("Left")
    type_text(app, "y")
    assert form.url == "https://xy/repo.git"


def test_search_query_cursor_editing(temp_repo):
    app = make_app(temp_repo)
    app.on_key("/")
    assert app.focused_input == "search"
    tab = app.current()
    type_text(app, "fx")
    app.on_key("Left")
    type_text(app, "i")
    assert tab.search_query == "fix"


def test_right_at_end_stays_end(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "ab")
    app.on_key("Right")  # cursor None → stays None
    assert app.input_cursor is None
    app.on_key("Left")
    app.on_key("Right")
    assert app.input_cursor is None  # reaching the end collapses to None


def test_caret_renders_at_position(temp_repo, monkeypatch):
    import whisper_git_tpu.app.views.widgets as W
    monkeypatch.setattr(W, "cursor_visible", lambda: True)
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "abc")
    app.on_key("Left")
    tree = app.build((1280.0, 800.0))
    texts = []

    def walk(el):
        if el.kind == "text":
            texts.append(el.text)
        for ch in el.children:
            walk(ch)

    walk(tree)
    assert any(t == "ab▏c" for t in texts), [t for t in texts if "▏" in t]


# -- bracketed paste ----------------------------------------------------------

def test_paste_into_subject_flattens_newlines(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    app.on_paste("fix the\nthing\r\nproperly")
    assert app.current().active_view().draft_subject == \
        "fix the thing properly"


def test_paste_into_body_keeps_newlines(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:body")
    app.on_paste("line one\r\nline two")
    assert app.current().active_view().draft_body == "line one\nline two"


def test_paste_at_cursor_position(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "fix bug")
    app.on_key("Home")
    for _ in range(4):
        app.on_key("Right")
    app.on_paste("the ")
    assert app.current().active_view().draft_subject == "fix the bug"


def test_paste_into_palette_query(temp_repo):
    app = make_app(temp_repo)
    app.on_key("p", ctrl=True)
    app.on_paste("settings")
    assert app.palette.query == "settings"


def test_paste_event_decoding():
    """Decode ESC[200~…ESC[201~ from a pipe through the real reader."""
    import os
    from whisper_git_tpu.host.term_input import TerminalInput, PasteEvent
    r, w = os.pipe()
    try:
        os.write(w, b"\x1b[200~hello \xf0\x9f\x8c\x8d world\x1b[201~")
        term = TerminalInput(fd=r)
        ev = term.poll(timeout=0.2)
        assert isinstance(ev, PasteEvent)
        assert ev.text == "hello 🌍 world"
    finally:
        os.close(r)
        os.close(w)


def test_paste_event_dispatch(temp_repo):
    from whisper_git_tpu.host.term_input import PasteEvent, dispatch
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    dispatch(app, PasteEvent("pasted subject"))
    assert app.current().active_view().draft_subject == "pasted subject"


# -- selection (shift-arrows), clipboard, IME composition --------------------

def test_shift_arrow_selection_and_replace(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "hello")
    app.on_key("Left", shift=True)
    app.on_key("Left", shift=True)
    view = app.current().active_view()
    assert app._selection_span(view.draft_subject) == (3, 5)
    # Typing replaces the selection.
    type_text(app, "p!")
    assert view.draft_subject == "help!"
    assert app.input_anchor is None
    # Plain arrow clears any selection.
    app.on_key("Left", shift=True)
    app.on_key("Left")
    assert app._selection_span(view.draft_subject) is None


def test_selection_backspace_delete(temp_repo):
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "abcdef")
    app.on_key("Home")
    app.on_key("Right", shift=True)
    app.on_key("Right", shift=True)
    view = app.current().active_view()
    assert app._selection_span(view.draft_subject) == (0, 2)
    app.on_key("Backspace")
    assert view.draft_subject == "cdef"
    app.on_key("End")
    app.on_key("Left", shift=True)
    app.on_key("Delete")
    assert view.draft_subject == "cde"


def test_select_all_and_copy(temp_repo, monkeypatch):
    import subprocess as sp

    app = make_app(temp_repo)  # needs real git; patch sp.run only after

    def no_tools(*a, **k):
        raise OSError("no clipboard tool")

    monkeypatch.setattr(sp, "run", no_tools)
    app.handle_action("focus-input:subject")
    type_text(app, "copy me")
    app.on_key("a", ctrl=True)
    view = app.current().active_view()
    assert app._selection_span(view.draft_subject) == (0, 7)
    app.on_key("c", ctrl=True)
    assert app.selection_text == "copy me"
    assert app.primary_selection == "copy me"  # PRIMARY mirror
    app.on_key("Backspace")
    assert view.draft_subject == ""


def test_combining_character_composes(temp_repo):
    """Terminal IME / dead-key input: a combining acute after 'e' must
    compose to a single 'é' (NFC), not insert a floating mark."""
    app = make_app(temp_repo)
    app.handle_action("focus-input:subject")
    type_text(app, "caf")
    app.on_text("e")
    app.on_text("́")  # COMBINING ACUTE ACCENT
    view = app.current().active_view()
    assert view.draft_subject == "café"
    app.on_text("!")
    assert view.draft_subject == "café!"


def test_middle_click_paste_primary(temp_repo, monkeypatch):
    import subprocess as sp

    app = make_app(temp_repo)  # needs real git; patch sp.run only after

    def no_tools(*a, **k):
        raise OSError("no clipboard tool")

    monkeypatch.setattr(sp, "run", no_tools)
    app.primary_selection = "3f2a91c"
    app.handle_action("focus-input:subject")
    app.paste_primary()
    view = app.current().active_view()
    assert view.draft_subject == "3f2a91c"


def test_middle_click_paste_targets_click_not_stale_focus(temp_repo,
                                                          monkeypatch):
    """A middle-click that does NOT land on a text input must not inject
    PRIMARY text into a previously-focused field (reference pastes into
    the clicked input, src/host.rs:874-897)."""
    import subprocess as sp

    app = make_app(temp_repo)

    def no_tools(*a, **k):
        raise OSError("no clipboard tool")

    monkeypatch.setattr(sp, "run", no_tools)
    app.primary_selection = "SPURIOUS"
    app.handle_action("focus-input:subject")

    # Click elsewhere (graph chrome): no focus-input route fires.
    app._focus_route_hit = False
    app.paste_primary(at_click=True)
    view = app.current().active_view()
    assert view.draft_subject == ""

    # Click ON the input: the focus-input route fires, paste lands.
    app.handle_action("focus-input:subject")  # sets _focus_route_hit
    app.paste_primary(at_click=True)
    assert view.draft_subject == "SPURIOUS"


def test_copy_sha_sets_primary(temp_repo, monkeypatch):
    import subprocess as sp

    app = make_app(temp_repo)  # needs real git; patch sp.run only after

    def no_tools(*a, **k):
        raise OSError("no clipboard tool")

    monkeypatch.setattr(sp, "run", no_tools)
    app._act_copy_sha("deadbeef", 0, 0)
    assert app.primary_selection == "deadbeef"


def test_terminal_shift_arrow_sequence():
    import os as _os

    from whisper_git_tpu.host.term_input import TerminalInput

    r, w = _os.pipe()
    try:
        _os.write(w, b"\x1b[1;2D\x1b[1;2C\x1b[1;6H")
        term = TerminalInput(fd=r)
        ev = term.poll(timeout=0.2)
        assert ev.key == "Left" and ev.shift and not ev.ctrl
        ev = term.poll(timeout=0.2)
        assert ev.key == "Right" and ev.shift
        ev = term.poll(timeout=0.2)
        assert ev.key == "Home" and ev.shift and ev.ctrl
    finally:
        _os.close(r)
        _os.close(w)


def test_selection_renders_highlight(temp_repo):
    """The subject input paints the selected span on an accent wash."""
    from whisper_git_tpu.app.views.widgets import input_text_el
    from whisper_git_tpu.ui.theme import DARK

    el = input_text_el("hello", 3, 5, True, DARK.text, 13.0)
    # row(text("hel"+caret…), rect(text("lo"), fill=accent-wash))
    assert el.kind == "row"
    fills = [c.fill for c in el.children if c.fill is not None]
    assert fills and abs(fills[0][3] - 0.35) < 1e-6


# ---------------------------------------------------------------------------
# Exact RTL caret mapping (VERDICT r4 ask #7): logical caret index →
# visual slot via the bidi levels render/shaping.py already computes —
# cosmic-text's caret behavior the reference inherits
# (/root/reference/docs/render_engine.md:104-112).
# ---------------------------------------------------------------------------

def test_caret_slots_pure_rtl_hebrew():
    from whisper_git_tpu.render.shaping import caret_slots, shape_visual

    s = "שלום"                       # 4 Hebrew letters
    vis = shape_visual(s)
    assert vis == s[::-1]            # sanity: pure RTL reverses
    # Caret before logical char k sits at visual slot n-k: logical
    # start renders at the RIGHT edge, logical end at the LEFT.
    assert caret_slots(s) == (4, 3, 2, 1, 0)


def test_caret_slots_mixed_ltr_rtl():
    from whisper_git_tpu.render.shaping import caret_slots

    s = "ab" + "שלום" + "cd"         # LTR para with an RTL island
    slots = caret_slots(s)
    n = len(s)
    assert len(slots) == n + 1
    # Inside the LTR prefix/suffix the map is the identity.
    assert slots[0] == 0 and slots[1] == 1 and slots[2] == 2
    assert slots[7] == 7 and slots[8] == 8
    # Inside the RTL island the caret walks RIGHT-to-LEFT visually:
    # logical 3 (after one Hebrew letter) renders at the island's right
    # edge minus one, etc.
    assert slots[3] == 5 and slots[4] == 4 and slots[5] == 3
    # Every slot stays inside the visual string.
    assert all(0 <= v <= n for v in slots)


def test_caret_insert_preserves_arabic_joining():
    """The old logical-string caret insert snapped the letters around
    the caret to isolated/final forms (the caret glyph broke the
    joining context) — the visual insert must leave the rendered word
    byte-identical apart from the caret glyph itself."""
    from whisper_git_tpu.render.shaping import (
        PRESHAPED,
        caret_insert_visual,
        shape_visual,
    )

    s = "محرر"                        # joins into medial forms
    vis = shape_visual(s)
    for k in range(len(s) + 1):
        out = caret_insert_visual(s, k)
        assert out.startswith(PRESHAPED)
        assert out[1:].replace("▏", "") == vis, (
            f"caret at {k} changed the rendered word: "
            f"{out[1:]!r} vs {vis!r}")


def test_insert_caret_routes_rtl_through_visual_map():
    from whisper_git_tpu.render.shaping import PRESHAPED
    from whisper_git_tpu.ui import insert_caret

    out = insert_caret("שלום", 2)
    assert out.startswith(PRESHAPED)
    # Slot 2 of the visual reversal: "םו▏לש".
    assert out[1:] == "םו▏לש"
    # LTR path unchanged.
    assert insert_caret("hello", 2) == "he▏llo"


def test_caret_golden_positions_hebrew_subject():
    """Golden x-positions: the caret glyph's measured x offset inside a
    Hebrew subject must DESCEND as the logical index advances (RTL
    text runs right-to-left) and match the prefix advance of the
    visual slot exactly."""
    from whisper_git_tpu.render.renderer import get_renderer
    from whisper_git_tpu.render.shaping import caret_slots, shape_visual

    m = get_renderer().measurer
    s = "שלום"
    vis = shape_visual(s)
    slots = caret_slots(s)
    size = 13.0
    xs = []
    for k in range(len(s) + 1):
        from whisper_git_tpu.render.shaping import PRESHAPED

        xs.append(m.width(PRESHAPED + vis[:slots[k]], size))
    assert xs == sorted(xs, reverse=True), \
        f"caret x must walk right-to-left: {xs}"
    assert xs[-1] == 0.0 and xs[0] > 0.0


def test_click_to_caret_roundtrip_rtl_and_ltr():
    from whisper_git_tpu.render.renderer import get_renderer
    from whisper_git_tpu.render.shaping import PRESHAPED, caret_slots, \
        shape_visual

    m = get_renderer().measurer
    size = 13.0
    for s in ("hello", "שלום", "ab" + "שלום" + "cd"):
        vis = shape_visual(s)
        slots = caret_slots(s)
        for k in range(len(s) + 1):
            x = m.width(PRESHAPED + vis[:slots[k]], size)
            got = m.caret_index_from_click(s, size, x)
            # Roundtrip: clicking exactly at caret k's x must return a
            # caret at the same VISUAL position (logical k itself, or a
            # logical index sharing the slot at run boundaries).
            assert slots[got] == slots[k], (s, k, got)
