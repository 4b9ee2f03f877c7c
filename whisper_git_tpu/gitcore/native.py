"""ctypes loader for the native C++ gitcore (`libwgitcore.so`).

The native library accelerates the hot, frequently-polled paths (the 5 s
ref-fingerprint reconciliation, loose-ref parsing). Build with
`make -C native`. Every entry point has a pure-Python fallback in the
calling module, so the package works without the .so.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libwgitcore.so"),
        os.path.join(here, "libwgitcore.so"),
    ]
    env = os.environ.get("WGIT_NATIVE_LIB")
    if env:
        candidates.insert(0, env)
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.wgit_ref_fingerprint.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t]
                lib.wgit_ref_fingerprint.restype = ctypes.c_int
                if hasattr(lib, "wgit_quick_dirty"):
                    lib.wgit_quick_dirty.argtypes = [
                        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
                    lib.wgit_quick_dirty.restype = ctypes.c_int
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _lib() is not None


def ref_fingerprint(git_dir: str, common_dir: str) -> Optional[str]:
    lib = _lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(64)
    rc = lib.wgit_ref_fingerprint(git_dir.encode(), common_dir.encode(), buf, 64)
    if rc != 0:
        return None
    return buf.value.decode()


# Bitmask returned by quick_dirty (keep in sync with native/statusscan.cc).
DIRTY_STAGED = 1
DIRTY_UNSTAGED = 2
DIRTY_UNTRACKED = 4
DIRTY_CONFLICTED = 8


def quick_dirty(workdir: str, git_dir: str,
                common_dir: str) -> Optional[int]:
    """Subprocess-free dirty check via the native scanner (index parse +
    object-store HEAD-tree compare + stat walk + gitignore engine). Returns
    a DIRTY_* bitmask (0 = certainly clean), or None when the native library
    is absent or the repository uses features the scanner cannot certify
    (sha256, split/sparse/v4 index, autocrlf, content filters) — callers
    must then fall back to `git status`."""
    lib = _lib()
    if lib is None or not hasattr(lib, "wgit_quick_dirty"):
        return None
    rc = lib.wgit_quick_dirty(
        workdir.encode(), git_dir.encode(), common_dir.encode())
    if rc < 0:
        return None
    return rc
