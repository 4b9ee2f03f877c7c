"""Terminal keyboard input for the display-less host loop.

The reference's windowed host translates winit keyboard events into app
keys (reference: host.rs:747 map_key). With no display server here, the
interactive mode reads raw terminal input instead: escape sequences map
to the same key names `WhisperApp.on_key` expects, control bytes map to
Ctrl chords, and printable characters route to `on_text` via the app's
focus rules.
"""

from __future__ import annotations

import os
import select
import sys
import termios
import tty
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class KeyEvent:
    key: str
    ctrl: bool = False
    shift: bool = False


_ESC_MAP = {
    "[A": "Up", "[B": "Down", "[C": "Right", "[D": "Left",
    "[5~": "PageUp", "[6~": "PageDown",
    "[H": "Home", "[F": "End", "[3~": "Delete",
    "[Z": "ShiftTab",
}


class TerminalInput:
    """Raw-mode stdin reader. Use as a context manager."""

    def __init__(self, fd: Optional[int] = None):
        self.fd = fd if fd is not None else sys.stdin.fileno()
        self._saved = None

    def __enter__(self):
        try:
            self._saved = termios.tcgetattr(self.fd)
            tty.setcbreak(self.fd)
        except (termios.error, OSError):
            self._saved = None
        return self

    def __exit__(self, *exc):
        if self._saved is not None:
            try:
                termios.tcsetattr(self.fd, termios.TCSADRAIN, self._saved)
            except (termios.error, OSError):
                pass

    def _read_byte(self, timeout: float) -> Optional[bytes]:
        ready, _, _ = select.select([self.fd], [], [], timeout)
        if not ready:
            return None
        data = os.read(self.fd, 1)
        return data or None

    def poll(self, timeout: float = 0.0) -> Optional[KeyEvent]:
        b = self._read_byte(timeout)
        if b is None:
            return None
        c = b[0]
        if c == 0x1B:  # ESC: sequence or bare Escape
            seq = b""
            while len(seq) < 6:
                nxt = self._read_byte(0.01)
                if nxt is None:
                    break
                seq += nxt
                if seq.decode("latin1") in _ESC_MAP:
                    break
            name = _ESC_MAP.get(seq.decode("latin1"))
            if name == "ShiftTab":
                return KeyEvent("Tab", shift=True)
            if name is not None:
                return KeyEvent(name)
            return KeyEvent("Escape")
        if c in (0x0D, 0x0A):
            return KeyEvent("Enter")
        if c == 0x09:
            return KeyEvent("Tab")
        if c in (0x7F, 0x08):
            return KeyEvent("Backspace")
        if 0x01 <= c <= 0x1A:  # Ctrl+A..Ctrl+Z
            letter = chr(c + 0x60)
            return KeyEvent(letter, ctrl=True)
        ch = b.decode("utf-8", "replace")
        # Multi-byte UTF-8: read continuation bytes.
        if c >= 0xC0:
            need = 1 + (c >= 0xE0) + (c >= 0xF0)
            rest = b""
            for _ in range(need):
                nxt = self._read_byte(0.01)
                if nxt is None:
                    break
                rest += nxt
            ch = (b + rest).decode("utf-8", "replace")
        return KeyEvent(ch, shift=ch.isupper())


def dispatch(app, ev: KeyEvent) -> None:
    """Route one key event through the app's keyboard rules."""
    if ev.ctrl or len(ev.key) > 1:
        app.on_key(ev.key, ctrl=ev.ctrl, shift=ev.shift)
    else:
        # Single printable char: on_key handles focus-aware routing
        # (it forwards to on_text when an input is focused).
        app.on_key(ev.key, ctrl=False, shift=ev.shift)
