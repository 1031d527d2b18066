"""Build + load the native shared library (g++, no external deps)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_demiurge_native.so")
_SRCS = [os.path.join(_DIR, "lake_solver.cpp"),
         os.path.join(_DIR, "snap_codec.cpp")]
_LOCK = threading.Lock()
_LIB = None


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale. Returns the .so path."""
    stale = force or not os.path.exists(_SO) or any(
        os.path.getmtime(s) > os.path.getmtime(_SO) for s in _SRCS
    )
    if stale:
        cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
               "-o", _SO] + _SRCS
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = ctypes.CDLL(build())
        return _LIB


if __name__ == "__main__":
    print(build(force=True))
