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
    """Compile to a temp path, then atomically publish with os.replace —
    two processes building concurrently (test suite + benchmark, sharded
    cohort workers) must never dlopen a half-written ELF or truncate a
    library another process has mapped. An fcntl lock serializes the
    g++ invocations themselves."""
    import fcntl
    import tempfile

    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    lock_path = _LIB + ".lock"
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        try:
            # another process may have finished the build while we waited
            if (os.path.exists(_LIB)
                    and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
                return
            fd, tmp = tempfile.mkstemp(suffix=".so",
                                       dir=os.path.dirname(_LIB))
            os.close(fd)
            try:
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                       _SRC, "-o", tmp]
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, _LIB)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        finally:
            fcntl.flock(lock_f, fcntl.LOCK_UN)


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
