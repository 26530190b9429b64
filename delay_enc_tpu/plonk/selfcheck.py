"""Host-oracle cross-checks for the TPU proving pipeline (debug aid).

DELAY_ENC_SELFCHECK=1 makes create_proof recompute every commitment with
the native C Pippenger MSM (native/ecops.c) on the same coefficient
arrays and compare — isolating "device MSM wrong" from "polynomials
wrong" from "verifier wrong" when a proof fails verification.  Level 2
additionally spot-checks the GWC witness division identity at a random
point.  Pure host code: no jitted shapes change, the compile cache is
untouched.  Results go to stderr as `# selfcheck ...` lines.

Rationale: the CPU test suite runs the array/scan kernel forms; the TPU
runs the unrolled limb-row forms (ops/limbs.py _backend_unrolls), so a
TPU-only kernel bug is invisible to CPU tests.  This harness checks the
TPU results against third-implementation oracles *in situ*.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..fields.bn254 import FR
from ..ops import limbs as L
from ..ops import msm as M

CTX = L.FR_CTX
_CHUNK = 8192  # native msm_host point cap per call


def level() -> int:
    try:
        return int(os.environ.get("DELAY_ENC_SELFCHECK", "0") or "0")
    except ValueError:
        return 1


_g1_host_cache: dict = {}


def _g1_host(srs):
    key = id(srs.g1_powers)
    if key not in _g1_host_cache:
        _g1_host_cache.clear()  # one SRS at a time
        _g1_host_cache[key] = M.points_from_device(srs.g1_powers)
    return _g1_host_cache[key]


def _msm_host_chunked(scalars, points):
    """Native C MSM in 8K chunks + host Jacobian combine; None = identity,
    or the string "unavailable"."""
    from ..curves.bn254 import G1
    from ..native.ec import msm_host

    acc = None
    for i in range(0, len(points), _CHUNK):
        r = msm_host(scalars[i : i + _CHUNK], points[i : i + _CHUNK], FR.p)
        if r == "unavailable":
            return "unavailable"
        if r is not None:
            acc = r if acc is None else G1.add(acc, r)
    return acc


def check_commits(srs, coeffs_dev, got_pts, tag: str) -> None:
    """Compare device MSM commitments against the C oracle on the same
    coefficients.  `coeffs_dev`: list of (n,16) Montgomery limb arrays;
    `got_pts`: the host affine results the prover is about to absorb."""
    pts_host = _g1_host(srs)
    for j, cf in enumerate(coeffs_dev):
        sc = CTX.from_mont_np(np.asarray(jax.device_get(cf)))
        want = _msm_host_chunked(sc, pts_host[: len(sc)])
        if want == "unavailable":
            print(f"# selfcheck {tag}[{j}]: C MSM unavailable — skipped",
                  file=sys.stderr, flush=True)
            return
        ok = want == got_pts[j]
        print(f"# selfcheck {tag}[{j}]: {'ok' if ok else 'MISMATCH'}"
              + ("" if ok else f" device={got_pts[j]} host={want}"),
              file=sys.stderr, flush=True)


def _eval_host(coeff_ints, x: int) -> int:
    acc = 0
    for c in reversed(coeff_ints):
        acc = (acc * x + c) % FR.p
    return acc


def check_gwc_witness(stack_dev, w_dev, v: int, z: int, tag: str) -> None:
    """Spot-check the GWC witness identity W(r)*(r-z) == Q(r) - Q(z) at a
    random host point r, where Q = sum_i v^i q_i over the opened stack."""
    rng = np.random.default_rng(0xC0FFEE)
    r = int.from_bytes(bytes(rng.integers(0, 256, 32, dtype="uint8")), "little") % FR.p
    qs = CTX.from_mont_np(
        np.asarray(jax.device_get(stack_dev)).reshape(-1, L.NLIMB)
    )
    m, n = stack_dev.shape[0], stack_dev.shape[1]
    q_r = q_z = 0
    vp = 1
    for i in range(m):
        ci = qs[i * n : (i + 1) * n]
        q_r = (q_r + vp * _eval_host(ci, r)) % FR.p
        q_z = (q_z + vp * _eval_host(ci, z)) % FR.p
        vp = vp * v % FR.p
    w = CTX.from_mont_np(np.asarray(jax.device_get(w_dev)))
    w_r = _eval_host(w, r)
    ok = w_r * ((r - z) % FR.p) % FR.p == (q_r - q_z) % FR.p
    print(f"# selfcheck gwc {tag}: {'ok' if ok else 'MISMATCH'}",
          file=sys.stderr, flush=True)
