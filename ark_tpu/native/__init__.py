"""Native (C++) host kernels, built on demand with g++ and loaded via ctypes.

These cover the inherently sequential algorithms that do not map to XLA
(watershed priority-flood, connected components). The .so is compiled once
into this directory and cached; rebuilds trigger automatically when the
source is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "watershed.cpp")
# cached under a non-package subdir so import discovery never sees the .so
# (it is a C-ABI library loaded by path via ctypes, not a Python extension)
_LIB = os.path.join(_DIR, "_build", "_native.so")

_lib = None


def _build():
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.watershed.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.watershed.restype = None
    lib.label_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.label_components.restype = None
    _lib = lib
    return lib
