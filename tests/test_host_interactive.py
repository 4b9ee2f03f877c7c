"""Interactive terminal host: SGR mouse decoding, cell→pixel mapping,
half-block diff emission, and hover restyling through the Runner → build →
scene pipeline (reference: hover highlighting on buttons/sidebar/file
rows; host.rs pointer translation)."""

from __future__ import annotations

import io
import numpy as np
import pytest

from whisper_git_tpu.host.term_display import TermDisplay
from whisper_git_tpu.host.term_input import MouseEvent, parse_sgr_mouse
from whisper_git_tpu.ui import rect, text
from whisper_git_tpu.ui.hover import apply_hover
from whisper_git_tpu.ui.runner import Runner


# -- SGR mouse decoding -------------------------------------------------------

def test_sgr_press_release_move_wheel():
    assert parse_sgr_mouse("0;10;5", "M") == MouseEvent("down", 10, 5, "left")
    assert parse_sgr_mouse("0;10;5", "m") == MouseEvent("up", 10, 5, "left")
    assert parse_sgr_mouse("2;3;4", "M") == MouseEvent("down", 3, 4, "right")
    assert parse_sgr_mouse("35;7;8", "M") == MouseEvent(
        "move", 7, 8, "none")
    assert parse_sgr_mouse("32;7;8", "M") == MouseEvent(
        "move", 7, 8, "left")  # drag
    assert parse_sgr_mouse("64;2;2", "M").wheel == 1
    assert parse_sgr_mouse("65;2;2", "M").wheel == -1
    assert parse_sgr_mouse("68;2;2", "M").shift  # shift+wheel up
    assert parse_sgr_mouse("garbage", "M") is None


def test_terminal_input_parses_mouse_bytes():
    import os

    from whisper_git_tpu.host.term_input import TerminalInput

    r, w = os.pipe()
    os.write(w, b"\x1b[<0;12;7M")
    ti = TerminalInput(fd=r)
    ev = ti.poll(timeout=0.2)
    assert ev == MouseEvent("down", 12, 7, "left")
    os.write(w, b"\x1b[<65;1;1M")
    ev = ti.poll(timeout=0.2)
    assert ev.kind == "wheel" and ev.wheel == -1
    os.close(r)
    os.close(w)


# -- cell→pixel mapping + diff emission ---------------------------------------

def test_cell_to_px_center_mapping():
    d = TermDisplay((1280, 800), out=io.StringIO())
    d.cols, d.rows = 160, 50
    x, y = d.cell_to_px(1, 1)
    assert (x, y) == (0.5 * 1280 / 160, 0.5 * 800 / 50)
    x, y = d.cell_to_px(160, 50)
    assert x < 1280 and y < 800


def test_diff_emit_only_changed_rows():
    out = io.StringIO()
    d = TermDisplay((64, 64), out=out)
    d.cols, d.rows = 8, 4
    top = np.zeros((4, 8, 3), np.uint8)
    bot = np.zeros((4, 8, 3), np.uint8)
    first = d._diff_emit(top, bot)
    assert first.count("\x1b[") > 0  # full paint
    again = d._diff_emit(top, bot)
    assert again == ""  # nothing changed
    top2 = top.copy()
    top2[2, 3] = (255, 0, 0)
    partial = d._diff_emit(top2, bot)
    assert "\x1b[3;1H" in partial  # only row 3 re-emitted
    assert "\x1b[1;1H" not in partial


def test_row_str_half_blocks():
    top = np.array([[255, 0, 0], [255, 0, 0]], np.uint8)
    bot = np.array([[0, 0, 255], [0, 0, 255]], np.uint8)
    s = TermDisplay._row_str(top, bot)
    assert s.count("▀") == 2
    # color state is only re-emitted when it changes
    assert s.count("38;2;255;0;0") == 1
    assert s.count("48;2;0;0;255") == 1


# -- hover restyling -----------------------------------------------------------

def test_apply_hover_swaps_fill_copy_on_write():
    from whisper_git_tpu.ui import column

    btn = rect(text("Fetch"), route="fetch", fill=(0, 0, 0, 1),
               hover_fill=(1, 0, 0, 1), cache_key=("btn",))
    sibling = rect(text("Pull"), route="pull", fill=(0, 0, 0, 1))
    tree = column(btn, sibling, cache_key=("bar",))
    out = apply_hover(tree, "fetch")
    assert out is not tree
    assert out.children[0].fill == (1, 0, 0, 1)
    assert out.children[0].cache_key == ("btn", "hover")
    assert out.children[1] is sibling  # sibling identity preserved
    # no hover target → tree unchanged, same identity
    assert apply_hover(tree, "nonexistent") is tree
    assert apply_hover(tree, None) is tree
    # element without hover_fill is not restyled
    assert apply_hover(tree, "pull") is tree


def test_pane_divider_drag(temp_repo):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    runner = Runner(app)
    root = runner.prepare((1280.0, 800.0))
    w0 = app.config.sidebar_width
    # find the sidebar divider
    div = None

    def walk(node):
        nonlocal div
        if node.el.route_drag == "pane-resize:sidebar":
            div = node
        for c in node.children:
            walk(c)

    walk(root)
    assert div is not None, "sidebar divider missing"
    cx, cy = div.x + div.w / 2, div.y + div.h / 2
    runner.pointer_down(cx, cy)
    assert runner.pointer_drag(cx + 40.0, cy) is True
    assert app.config.sidebar_width == pytest.approx(w0 + 40.0)
    runner.pointer_up()
    assert runner.pointer_drag(cx + 80.0, cy) is False  # drag released
    assert app.config.sidebar_width == pytest.approx(w0 + 40.0)
    # right divider drags inverted (left = wider panel)
    app.handle_action("pane-resize:right:-30.0:0.0")
    assert app.config.right_panel_width >= 140.0
    for tb in app.tabs:
        tb.stop_workers()


def test_scrollbar_thumb_drag(temp_repo, git):
    import subprocess

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    env_args = ["git", "-C", temp_repo, "commit", "--allow-empty", "-m"]
    for i in range(60):
        subprocess.run(env_args + [f"filler {i}"], check=True,
                       capture_output=True)
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    assert tab.history_scroll == 0.0
    app.handle_action("scroll-drag:history:0.0:60.0")
    assert tab.history_scroll > 0.0
    before = tab.history_scroll
    app.handle_action("scroll-drag:history:0.0:-600.0")
    assert tab.history_scroll == 0.0 < before
    for tb in app.tabs:
        tb.stop_workers()


def test_hover_paints_through_app_build(temp_repo):
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    runner = Runner(app)
    runner.prepare((1280.0, 800.0))
    # find a hoverable element (header buttons carry hover_fill)
    target = None

    def walk(node):
        nonlocal target
        if target is not None:
            return
        el = node.el
        if el.route and el.hover_fill is not None:
            target = node
            return
        for c in node.children:
            walk(c)

    walk(runner.root)
    assert target is not None, "no hoverable element in the chrome"
    cx, cy = target.x + target.w / 2, target.y + target.h / 2
    assert runner.pointer_move(cx, cy) is True
    assert app.hover_route == target.el.route
    tree = app.build((1280.0, 800.0))

    # the rebuilt tree paints the hover fill on that route
    def find(el, route):
        if el.route == route:
            return el
        for c in el.children:
            got = find(c, route)
            if got is not None:
                return got
        return None

    hovered = find(tree, target.el.route)
    assert hovered is not None
    assert hovered.fill == target.el.hover_fill
    # moving off clears it
    assert runner.pointer_move(0.0, 799.0) in (True, False)
    if app.hover_route != target.el.route:
        tree2 = app.build((1280.0, 800.0))
        cleared = find(tree2, target.el.route)
        assert cleared.fill == target.el.fill
    for tb in app.tabs:
        tb.stop_workers()


def test_next_wake_blink_deadline(temp_repo):
    """Animation-aware wakes (reference README.md:14 'Continuous redraw
    for smooth cursor blink'): a focused text input pulls the idle wake
    from the 1 s safety net down to the 0.25 s blink quarter-phase."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.host.loop import next_wake_timeout

    tab = RepoTab.open(temp_repo)
    app = WhisperApp.with_tabs([tab])
    assert next_wake_timeout(app, 0.0) == 1.0
    app.focused_input = "subject"
    assert next_wake_timeout(app, 0.0) == 0.25
    app.focused_input = ""
    app.toasts.append(type("T", (), {"text": "hi", "kind": "info"})())
    assert next_wake_timeout(app, 0.0) == 0.25
    tab.stop_workers()


def test_idle_focused_input_blinks_in_loop(temp_repo, monkeypatch):
    """Loop-driven: with a focused input and NO input events, consecutive
    frames must observe both caret phases within ~1.5 s — the wake timer
    alone (no doorbell) has to drive the blink."""
    import time as _time

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.app.views import widgets
    from whisper_git_tpu.app.views.widgets import (
        cursor_visible,
        freeze_cursor,
    )
    from whisper_git_tpu.host.loop import run_loop

    # This test needs the REAL wall-clock blink; conftest pins it for
    # pixel determinism everywhere else.
    prev = widgets._CURSOR_FREEZE
    freeze_cursor(None)
    monkeypatch.setenv("WGIT_NO_INPUT", "1")
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    app.focused_input = "subject"
    app.focus = "staging"

    phases = []
    orig_build = app.build

    def spy_build(viewport):
        phases.append(cursor_visible())
        return orig_build(viewport)

    app.build = spy_build
    t0 = _time.monotonic()
    try:
        run_loop(app, max_frames=7)
    finally:
        freeze_cursor(prev)
    elapsed = _time.monotonic() - t0
    assert len(set(phases)) == 2, (phases, elapsed)
    # 6 waited frames at the 0.25 s blink cadence ≈ 1.5 s, not the 6 s a
    # 1 s idle wake would take (slack for loaded CI machines).
    assert elapsed < 5.0, elapsed


def test_decrqm_mode_report_and_pixel_mouse():
    """SGR-Pixels (1016): the DECRQM report parses, and a confirmed
    pixel-mouse display maps sub-cell coordinates exactly (closing the
    one-cell pointer quantization for drags)."""
    import os as _os

    from whisper_git_tpu.host.term_input import ModeReport, TerminalInput

    r, w = _os.pipe()
    try:
        _os.write(w, b"\x1b[?1016;1$y")
        term = TerminalInput(fd=r)
        ev = term.poll(timeout=0.2)
        assert isinstance(ev, ModeReport)
        assert ev.mode == 1016 and ev.value == 1
    finally:
        _os.close(r)
        _os.close(w)

    disp = TermDisplay.__new__(TermDisplay)
    disp.viewport = (1280, 800)
    disp.cols, disp.rows = 120, 40
    disp.pixel_mouse = True
    disp._px_size = (1200, 820)  # 41 lines × 20 px
    import shutil as _shutil
    import unittest.mock as mock

    with mock.patch.object(_shutil, "get_terminal_size",
                           return_value=_os.terminal_size((120, 41))):
        x1, _ = disp.cell_to_px(101, 10)
        x2, _ = disp.cell_to_px(104, 10)
    # 3 terminal px apart → ~3.2 app px, far finer than a 10.7 px cell.
    assert 2.0 < (x2 - x1) < 4.5
    disp.pixel_mouse = False
    xc1, _ = disp.cell_to_px(10, 10)
    xc2, _ = disp.cell_to_px(11, 10)
    assert abs((xc2 - xc1) - 1280 / 120) < 1e-6


def test_banner_then_first_present_erases_it():
    """The pre-frame status banner writes into the alt screen and the
    first present's full repaint covers it (prev None → every row
    dirty)."""
    import io

    import numpy as np

    from whisper_git_tpu.host.term_display import TermDisplay

    out = io.StringIO()
    d = TermDisplay((64, 32), out=out)
    d.banner("warming up the device link…")
    s = out.getvalue()
    assert "warming up the device link…" in s
    assert "\x1b[2;3H" in s                       # row 2, col 3
    # First present (sync path, no thread): all rows emitted.
    grid = np.zeros((d.rows * 2, d.cols, 3), np.uint8)
    d._present(grid)
    body = out.getvalue()[len(s):]
    assert body.count("\x1b[") >= d.rows          # every row repainted
    # After stop, the banner is suppressed (terminal restored).
    d._writes_stopped = True
    before = out.getvalue()
    d.banner("late banner")
    assert out.getvalue() == before


def test_async_present_latest_wins():
    """Pipelined-mailbox semantics: the loop never blocks the caller;
    after a stalled present (congestion window), STALE queued frames are
    dropped instead of replayed in FIFO order, and the newest always
    lands (latest-wins preserved across the pipeline)."""
    import threading
    import time as _time

    import jax.numpy as jnp

    out = io.StringIO()
    presented = []
    gate = threading.Event()

    d = TermDisplay((64, 64), out=out)
    d.cols, d.rows = 8, 4
    d._refresh_size = lambda: None   # pin the grid (and the jit signature)

    orig_present = d._present

    def slow_present(grid_dev):
        # First present stalls like a congested readback; later ones
        # pass straight through.
        if not presented:
            gate.wait(timeout=3.0)
        presented.append(np.asarray(grid_dev)[0, 0, 0])
        orig_present(grid_dev)

    d._present = slow_present
    d._thread = threading.Thread(target=d._present_loop, daemon=True)
    d._thread.start()
    try:
        # Warm the downsample jit out-of-band so the first timed show()
        # doesn't pay the compile.
        import jax

        from whisper_git_tpu.host.term_display import _downsample

        jax.block_until_ready(_downsample(
            jnp.zeros((64, 64, 4), jnp.uint8), d.rows * 2, d.cols))
        for shade in (5, 10, 20, 30, 40):
            frame = jnp.full((64, 64, 4), shade, jnp.uint8)
            t0 = _time.monotonic()
            d.show(frame)
            assert _time.monotonic() - t0 < 0.2  # never blocks the caller
        # Hold the stall past STALE_PRESENT_S so the queued 10/20/30
        # become provably stale while 40 is newer-in-flight.
        _time.sleep(d.STALE_PRESENT_S + 0.15)
        gate.set()
        deadline = _time.monotonic() + 3.0
        while _time.monotonic() < deadline and (
                not presented or presented[-1] != 40):
            _time.sleep(0.02)
        # The LAST frame always lands; the frames queued behind the
        # stall do NOT replay (at most the stalled one + the newest,
        # plus whatever presented before the queue went stale).
        assert presented and presented[-1] == 40
        assert 10 not in presented or 30 not in presented, presented
        assert len(presented) <= 3, presented
    finally:
        with d._cv:
            d._closing = True
            d._cv.notify()
        d._thread.join(timeout=2.0)


def test_pulse_period_and_wake(temp_repo, git):
    """'The Pulse' (design_feedback_feb2026.md:339): dirty-count-scaled
    period, volatile header dot, and the animation wake deadline."""
    import os

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.app.views.widgets import pulse_alpha, pulse_period
    from whisper_git_tpu.host.loop import (
        FRAME_TIMEOUT, PULSE_TIMEOUT, next_wake_timeout)
    from whisper_git_tpu.ui.layout import layout_tree

    assert pulse_period(1) == 2.0
    assert pulse_period(10) == 1.0
    assert pulse_period(30) == 0.5
    # Opacity oscillates within (0.3, 1.0] over a cycle.
    vals = [pulse_alpha(1, now=t * 0.2) for t in range(10)]
    assert max(vals) > 0.9 and min(vals) < 0.5

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync()
    app = WhisperApp.with_tabs([tab])
    # Clean tree: no pulse wake, no volatile dot.
    t = next_wake_timeout(app, 0.0)
    assert t == FRAME_TIMEOUT
    with open(os.path.join(temp_repo, "dirty.txt"), "w") as f:
        f.write("x\n")
    tab.refresh_sync()
    assert next_wake_timeout(app, 0.0) == PULSE_TIMEOUT
    root = layout_tree(app.build((1280.0, 800.0)), (1280, 800))
    vol = [n for n in root.walk()
           if n.el.kind == "rect" and n.el.volatile and n.el.width == 7]
    assert vol, "pulsing dirty dot missing from the header"
    tab.stop_workers()


def _feed_input(data: bytes):
    """TerminalInput over a pipe pre-loaded with `data`."""
    import os as _os

    from whisper_git_tpu.host.term_input import TerminalInput

    r, w = _os.pipe()
    _os.write(w, data)
    term = TerminalInput(fd=r)
    return term, w


def test_escape_then_buffered_text_survives():
    """ESC followed by buffered keystrokes (slow frame): the Escape is
    delivered AND the keystrokes survive (the collector used to consume
    up to 14 bytes and drop everything)."""
    import os as _os

    term, w = _feed_input(b"\x1babc")
    evs = []
    for _ in range(8):
        ev = term.poll(timeout=0.05)
        if ev is None:
            break
        evs.append(ev)
    _os.close(w)
    names = [e.key for e in evs]
    assert names == ["Escape", "a", "b", "c"], names


def test_ss3_application_cursor_arrows():
    """DECCKM application-cursor mode sends ESC O A..D — arrows must
    keep working (a crashed TUI can leave the terminal in this mode)."""
    import os as _os

    term, w = _feed_input(b"\x1bOA\x1bOD\x1bOF")
    keys = [term.poll(timeout=0.05).key for _ in range(3)]
    _os.close(w)
    assert keys == ["Up", "Left", "End"]


def test_eof_does_not_busy_spin():
    """After stdin EOF, poll(timeout) must consume its timeout instead
    of returning instantly forever (100% CPU in the drain loop)."""
    import os as _os
    import time as _time

    term, w = _feed_input(b"x")
    assert term.poll(timeout=0.05).key == "x"
    _os.close(w)  # EOF
    assert term.poll(timeout=0.05) is None  # observes EOF
    t0 = _time.monotonic()
    for _ in range(5):
        assert term.poll(timeout=0.02) is None
    assert _time.monotonic() - t0 >= 0.08  # timeouts actually honored


def test_render_worker_error_surfaces_on_ui_thread(temp_repo, monkeypatch,
                                                   tmp_path):
    """The render thread (host/loop.py) owns compile/dispatch/present; a
    worker exception must re-raise on the UI thread, not vanish with a
    daemon. Driven through the real run_loop with WGIT_FRAME_DUMP (the
    non-tty way to get a renderer + worker)."""
    import pytest as _pytest

    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.host.loop import run_loop
    from whisper_git_tpu.render import renderer as renderer_mod

    monkeypatch.setenv("WGIT_NO_INPUT", "1")
    monkeypatch.setenv("WGIT_FRAME_DUMP", str(tmp_path / "f.png"))
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])

    r = renderer_mod.get_renderer()

    class Boom(RuntimeError):
        pass

    def bad_compile(*a, **k):
        raise Boom("render worker died")

    monkeypatch.setattr(r, "compile", bad_compile)
    with _pytest.raises(Boom):
        run_loop(app, max_frames=50)


def test_render_worker_renders_frames_through_dump(temp_repo, monkeypatch,
                                                   tmp_path):
    """Happy path: run_loop's render worker produces a real frame dump
    before returning (teardown waits for the pending frame)."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.host.loop import run_loop

    dump = tmp_path / "frame.png"
    monkeypatch.setenv("WGIT_NO_INPUT", "1")
    monkeypatch.setenv("WGIT_FRAME_DUMP", str(dump))
    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    run_loop(app, max_frames=3)
    assert dump.exists() and dump.stat().st_size > 1000
    from PIL import Image
    import numpy as np

    img = np.asarray(Image.open(dump))
    assert img.shape[2] in (3, 4) and img.std() > 1.0  # real pixels


# ---------------------------------------------------------------------------
# Degraded host-side present (VERDICT r4 #1, host/degraded.py): during a
# link stall the PICTURE stays live — host-rasterized cell frames with a
# link chip, swapped back out by the next device frame.
# ---------------------------------------------------------------------------

def test_degraded_rasterize_cells_paints_fills_and_text():
    import numpy as np

    from whisper_git_tpu.host.degraded import rasterize_cells
    from whisper_git_tpu.ui import column, rect, text
    from whisper_git_tpu.ui.layout import layout_tree

    ui = column(
        rect(width="fill", height=32, fill=(0.8, 0.1, 0.1, 1.0)),
        rect(text("hello hello hello", color=(1.0, 1.0, 1.0, 1.0)),
             width="fill", flex=1, fill=(0.1, 0.1, 0.8, 1.0)),
        width="fill", height="fill")
    root = layout_tree(ui, (256.0, 128.0))
    grid = rasterize_cells(root, (256.0, 128.0), 32, 64,
                           (0.0, 0.0, 0.0))
    assert grid.shape == (32, 64, 3) and grid.dtype == np.uint8
    # Top band red, lower band blue.
    assert grid[2, 32, 0] > 150 and grid[2, 32, 2] < 80
    assert grid[24, 2, 2] > 150 and grid[24, 2, 0] < 80
    # The text row is measurably brighter than bare blue fill (coverage
    # smear blends the white text color in).
    bare = grid[28].astype(int).sum()
    texty = grid[9].astype(int).sum()
    assert texty > bare + 500, (texty, bare)


def test_degraded_present_chip_and_device_swap_back():
    import numpy as np

    out = io.StringIO()
    d = TermDisplay((64, 32), out=out)
    d.rows, d.cols = 8, 16
    assert d.device_frame_age() >= 0.0 and d.degraded_frames == 0
    host = np.full((16, 16, 3), 40, np.uint8)
    d.present_host_cells(host, chip=" approx ")
    assert d.degraded_frames == 1 and d._degraded_active
    assert "approx" in out.getvalue()
    # The next DEVICE frame swaps back: chip row forced dirty even when
    # its cell colors happen to be unchanged.
    n0 = len(out.getvalue())
    dev = np.full((16, 16, 3), 40, np.uint8)   # same colors as host grid
    d._present(dev)
    assert not d._degraded_active
    assert d.device_frames == 1 and d.device_frame_age() < 5.0
    emitted = out.getvalue()[n0:]
    assert "\x1b[1;1H" in emitted, "chip row was not repainted"


def test_degraded_present_rejects_stale_size():
    import numpy as np

    out = io.StringIO()
    d = TermDisplay((64, 32), out=out)
    d.rows, d.cols = 8, 16
    d.present_host_cells(np.zeros((10, 10, 3), np.uint8))
    assert d.degraded_frames == 0 and out.getvalue() == ""


def test_click_positions_caret_in_subject_input(temp_repo):
    """End-to-end click-to-caret (r5): clicking inside the staging
    subject input places the logical caret at the clicked x through the
    Runner's node stash + the measurer's caret map, instead of always
    jumping to the end."""
    from whisper_git_tpu.app.repo_tab import RepoTab
    from whisper_git_tpu.app.ui_app import WhisperApp
    from whisper_git_tpu.render.renderer import get_renderer

    tab = RepoTab.open(temp_repo)
    tab.refresh_sync(include_orphans=False)
    app = WhisperApp.with_tabs([tab])
    view = tab.active_view()
    view.draft_subject = "hello caret world"
    r = get_renderer()
    runner = Runner(app, measurer=r.measurer)
    root = runner.prepare((1280.0, 800.0))
    node = None

    def walk(n):
        nonlocal node
        if (n.el.route or "").startswith("focus-input:subject"):
            node = n
        for c in n.children:
            walk(c)

    walk(root)
    assert node is not None, "subject input not found"
    text_x0 = node.x + float(node.el.padding[3])
    # Click right after "hello " (6 chars) — measure that prefix.
    px = text_x0 + r.measurer.width("hello ", 13.0)
    runner.pointer_down(px, node.y + node.h / 2)
    assert app.focused_input == "subject"
    assert app.input_cursor == 6, app.input_cursor
    # Click far past the end puts the caret at the end (None).
    runner.pointer_up()
    runner.pointer_down(node.x + node.w - 2.0, node.y + node.h / 2)
    assert app.input_cursor is None
    for tb in app.tabs:
        tb.stop_workers()
