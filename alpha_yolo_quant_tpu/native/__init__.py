"""Native (C++) runtime components, loaded via ctypes with Python
fallbacks. Currently: the Verilog artifact emitter (fastwriter)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "_fastwriter.so")
_SRC = os.path.join(_DIR, "fastwriter.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def fastwriter() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native emitter; None when no
    toolchain is available — callers fall back to the Python writers."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.write_txt_activations.restype = ctypes.c_int
        lib.write_txt_activations.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.write_txt_weights.restype = ctypes.c_int
        lib.write_txt_weights.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_long, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib
