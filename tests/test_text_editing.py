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
