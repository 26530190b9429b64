"""Native (C) runtime components.

`limbops` — host-side Montgomery limb conversion, compiled on first import
with the system C compiler (cc -O2 -shared -fPIC) and loaded via ctypes.
Falls back silently to the pure-Python implementations in ops.limbs when no
compiler is available (the API surface in ops.limbs is unchanged either
way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_limbops.so")
_SRC = os.path.join(_HERE, "limbops.c")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the native library, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.from_mont.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    lib.to_mont.argtypes = [
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    _lib = lib
    return _lib
