"""Native (C++) runtime components, loaded via ctypes.

Currently: ``libfastlift`` — the color-refinement core (see
``fastlift.cpp``). The library is built on demand with the system g++ into
``_build/`` and cached; if no toolchain is available everything falls back
to the pure-Python implementations transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libfastlift.so")
_SRC = os.path.join(_HERE, "fastlift.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_fastlift() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = os.path.getmtime(_SRC)
        stale = (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < src_mtime
        )
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.lhvi_color_refine.restype = ctypes.c_int64
        lib.lhvi_color_refine.argtypes = [
            ctypes.c_int64,  # n_rv
            ctypes.c_int64,  # n_f
            ctypes.POINTER(ctypes.c_int64),  # f_off
            ctypes.POINTER(ctypes.c_int32),  # f_rvs
            ctypes.POINTER(ctypes.c_uint8),  # f_sym
            ctypes.POINTER(ctypes.c_int32),  # rv_color
            ctypes.POINTER(ctypes.c_int32),  # f_color
            ctypes.c_int64,  # max_rounds
        ]
        _lib = lib
        return _lib
