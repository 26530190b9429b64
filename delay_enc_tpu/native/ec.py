"""Python wrappers for the native BN254 G1 kernels (ecops.c).

Callers (`ops/msm.py`, `curves/bn254.py`) use these when the C library is
available and fall back to their pure-Python paths otherwise.
"""

from __future__ import annotations

import numpy as np

from ..fields.bn254 import FQ
from . import get_eclib

_P = FQ.p
_CONSTS = None


def _consts():
    global _CONSTS
    if _CONSTS is None:
        p_words = np.frombuffer(_P.to_bytes(32, "little"), dtype="<u8").copy()
        r2 = ((1 << 256) % _P) ** 2 % _P
        r2_words = np.frombuffer(r2.to_bytes(32, "little"), dtype="<u8").copy()
        n0inv = (-pow(_P, -1, 1 << 64)) % (1 << 64)
        _CONSTS = (p_words, r2_words, n0inv)
    return _CONSTS


def fold_planes_batch(planes: np.ndarray, base_bits: int):
    """planes: (B, np, 3, 16) uint32 u16-limb projective Montgomery plane
    sums (LSB-first).  Returns a list of B affine points [(x, y) | None],
    each = sum_p base^p planes[b, p].  None if the C library is missing."""
    lib = get_eclib()
    if lib is None:
        return None
    planes = np.ascontiguousarray(planes.astype(np.uint32, copy=False))
    b, n_planes = planes.shape[0], planes.shape[1]
    out = np.empty(b * 64, dtype=np.uint8)
    flags = np.empty(b, dtype=np.uint8)
    pw, r2w, n0 = _consts()
    lib.g1_fold_planes_batch(
        planes.ctypes.data, b, n_planes, base_bits,
        pw.ctypes.data, r2w.ctypes.data, n0, out.ctypes.data, flags.ctypes.data,
    )
    ob = out.tobytes()
    res = []
    for i in range(b):
        if not flags[i]:
            res.append(None)
        else:
            x = int.from_bytes(ob[64 * i : 64 * i + 32], "little")
            y = int.from_bytes(ob[64 * i + 32 : 64 * i + 64], "little")
            res.append((x, y))
    return res


def msm_host(scalars, points, order: int):
    """sum_i scalars[i] * points[i] over host affine ints.  Returns the
    affine point, None for identity, or the string "unavailable" when the
    C library is missing (distinct from a legitimate None result)."""
    lib = get_eclib()
    if lib is None or len(points) > 8192:
        return "unavailable"
    n = len(points)
    pts = bytearray(64 * n)
    scs = bytearray(32 * n)
    for i, (s, pt) in enumerate(zip(scalars, points)):
        s = s % order
        if pt is None or s == 0:
            continue  # row stays zero = identity/skip
        pts[64 * i : 64 * i + 32] = pt[0].to_bytes(32, "little")
        pts[64 * i + 32 : 64 * i + 64] = pt[1].to_bytes(32, "little")
        scs[32 * i : 32 * i + 32] = s.to_bytes(32, "little")
    out = np.empty(64, dtype=np.uint8)
    pw, r2w, n0 = _consts()
    rc = lib.g1_msm(
        bytes(pts), bytes(scs), n, pw.ctypes.data, r2w.ctypes.data, n0,
        out.ctypes.data,
    )
    if rc < 0:
        return "unavailable"
    if rc == 0:
        return None
    ob = out.tobytes()
    return (
        int.from_bytes(ob[:32], "little"),
        int.from_bytes(ob[32:], "little"),
    )
