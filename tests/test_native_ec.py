"""Native (C) G1 kernel tests: ecops.c vs the pure-Python group oracle.

The C library accelerates the prover's MSM plane fold and the verifier's
multi-scalar multiplication; both must agree bit-exactly with the Python
Jacobian implementations in curves/bn254.py (which are themselves validated
against the device MSM kernels in test_msm.py)."""

import numpy as np
import pytest

from delay_enc_tpu.curves.bn254 import G1, G1_GEN
from delay_enc_tpu.fields.bn254 import FR
from delay_enc_tpu.native import get_eclib
from delay_enc_tpu.native.ec import fold_planes_batch, msm_host

pytestmark = pytest.mark.skipif(get_eclib() is None, reason="no C compiler")


def _rand_points(rng, n):
    return [G1.mul(G1_GEN, int(rng.integers(1, 1 << 62))) for _ in range(n)]


def test_msm_host_matches_oracle():
    rng = np.random.default_rng(7)
    pts = _rand_points(rng, 9)
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(8)] + [FR.p - 1]
    expect = G1.msm(scalars, pts)
    got = msm_host(scalars, pts, FR.p)
    assert got == expect


def test_msm_host_identity_and_zero_handling():
    rng = np.random.default_rng(8)
    pts = _rand_points(rng, 3) + [None]
    scalars = [5, 0, FR.p, 123]  # 0 and p (= 0 mod p) must drop out
    expect = G1.msm(scalars, pts)
    assert msm_host(scalars, pts, FR.p) == expect
    # all-zero -> identity (None), not "unavailable"
    assert msm_host([0, 0], pts[:2], FR.p) is None


def test_msm_host_cancellation_to_identity():
    p1 = G1.mul(G1_GEN, 77)
    assert msm_host([1, 1], [p1, G1.neg(p1)], FR.p) is None


def test_msm_host_randomized_vs_oracle():
    """Fuzz the wNAF windowed MSM (full-width scalars, identity rows, zero
    scalars, duplicate bases) against the naive double-and-add oracle."""
    rng = np.random.default_rng(11)
    base_pts = _rand_points(rng, 6)
    for _ in range(8):
        n = int(rng.integers(1, 24))
        pts, scalars = [], []
        for _ in range(n):
            r = rng.random()
            pts.append(None if r < 0.1 else base_pts[int(rng.integers(6))])
            scalars.append(
                0 if r > 0.9 else int.from_bytes(rng.bytes(32), "little") % FR.p
            )
        assert msm_host(scalars, pts, FR.p) == G1.msm(scalars, pts)


def test_fq_sqrt_matches_python():
    from delay_enc_tpu.fields.bn254 import FQ
    from delay_enc_tpu.native.ec import fq_sqrt_host

    rng = np.random.default_rng(12)
    hits = misses = 0
    for _ in range(40):
        a = int.from_bytes(rng.bytes(32), "little") % FQ.p
        want = FQ.sqrt(a)
        got = fq_sqrt_host(a)
        assert got != "unavailable"
        if want is None:
            assert got is None
            misses += 1
        else:
            assert got in (want, FQ.p - want) and got * got % FQ.p == a
            hits += 1
    assert hits and misses  # both branches exercised
    assert fq_sqrt_host(0) == 0


def test_fold_planes_matches_python_horner():
    from delay_enc_tpu.ops import msm as M

    rng = np.random.default_rng(9)
    n_planes, b = 6, 2
    pts = [_rand_points(rng, n_planes) for _ in range(b)]
    pts[1][3] = None  # an identity plane sum (digit plane with no hits)
    planes_dev = M.points_to_device([p for row in pts for p in row]).reshape(
        b, n_planes, 3, 16
    )
    got = fold_planes_batch(np.asarray(planes_dev), base_bits=2)
    for i in range(b):
        expect = M.horner_host(pts[i])
        assert got[i] == expect


def test_fold_planes_base8():
    from delay_enc_tpu.ops import msm as M

    rng = np.random.default_rng(10)
    pts = _rand_points(rng, 4)
    planes_dev = M.points_to_device(pts).reshape(1, 4, 3, 16)
    got = fold_planes_batch(np.asarray(planes_dev), base_bits=3)[0]
    acc = None
    for i, p in enumerate(pts):
        acc = G1.add(acc, G1.mul(p, 8**i))
    assert got == acc


def test_uniform_to_fr_mont_matches_python():
    from delay_enc_tpu.fields.bn254 import FR
    from delay_enc_tpu.native.ec import uniform_to_fr_mont
    from delay_enc_tpu.ops import limbs as L

    rng = np.random.default_rng(21)
    raw = rng.integers(0, 256, (7, 64), dtype=np.uint8)
    got = uniform_to_fr_mont(raw)
    expect = L.FR_CTX.to_mont_np(
        [FR.from_uniform_bytes(bytes(raw[i])) for i in range(7)]
    )
    assert (got == expect).all()
