"""Frame loop driver — the windowed host's event loop without a display.

The reference's Host (src/host.rs) waits on winit events and timer
deadlines (`ControlFlow::WaitUntil`, next_wake — host.rs:46-50,206-219),
then runs before_build → build → render. This environment has no display
server, so the loop drives the same protocol headlessly: it blocks on the
EventLoopProxy doorbell with a timer-derived timeout, polls the async
engine, rebuilds the El tree, and (when WGIT_FRAME_DUMP is set) renders
each frame to a PNG so an operator can watch the app live.
"""

from __future__ import annotations

import os
import time

from ..app.ui_app import WhisperApp
from ..engine import EventLoopProxy

FRAME_TIMEOUT = 1.0  # safety-net cadence needs periodic wakeups


def next_wake_timeout(app: WhisperApp, now: float) -> float:
    """Earliest timer deadline (reference: HostApp::next_wake)."""
    timeout = FRAME_TIMEOUT
    for tab in app.tabs:
        if tab.busy_slots():
            timeout = min(timeout, 0.25)  # live spinner elapsed display
    if app.toasts:
        timeout = min(timeout, 0.25)
    return timeout


def run_loop(app: WhisperApp, max_frames: int | None = None) -> int:
    import sys

    proxy = EventLoopProxy()
    app.proxy = proxy
    dump_path = os.environ.get("WGIT_FRAME_DUMP")
    renderer = None
    if dump_path:
        from ..render.renderer import get_renderer

        renderer = get_renderer()

    interactive = sys.stdin.isatty() and not os.environ.get("WGIT_NO_INPUT")
    term_ctx = None
    term = None
    if interactive:
        from .term_input import TerminalInput

        term_ctx = TerminalInput()
        term = term_ctx.__enter__()

    frames = 0
    try:
        while not app.quit_requested:
            app.before_build()
            tree = app.build((app.config.window_width,
                              app.config.window_height))
            if renderer is not None:
                from ..render.renderer import save_png
                from ..ui.theme import DARK

                img = renderer.render(tree, (int(app.config.window_width),
                                             int(app.config.window_height)),
                                      DARK.background)
                save_png(img, dump_path)
            frames += 1
            if max_frames is not None and frames >= max_frames:
                break
            timeout = next_wake_timeout(app, time.monotonic())
            if term is not None:
                from .term_input import dispatch

                # Drain keys while waiting out the frame budget.
                deadline = time.monotonic() + timeout
                got_key = False
                while time.monotonic() < deadline:
                    ev = term.poll(timeout=min(
                        0.05, max(0.0, deadline - time.monotonic())))
                    if ev is not None:
                        dispatch(app, ev)
                        got_key = True
                        break
                    if proxy.pending():
                        break
                if not got_key:
                    proxy.wait(timeout=0.0)
            else:
                proxy.wait(timeout=timeout)
    finally:
        if term_ctx is not None:
            term_ctx.__exit__(None, None, None)
        for tab in app.tabs:
            tab.stop_workers()
    return 0
