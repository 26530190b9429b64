import numpy as np

import jax
import pytest

from delay_enc_tpu.curves.bn254 import G1, G1_GEN
from delay_enc_tpu.fields import FR
from delay_enc_tpu.ops import msm as M
from delay_enc_tpu.ops import limbs as L


def _host_points(n, seed=0):
    rng = np.random.default_rng(seed)
    return [G1.mul(G1_GEN, int(rng.integers(1, 1 << 62))) for _ in range(n)]


def test_complete_add_matches_host():
    pts = _host_points(8, 0)
    a = M.points_to_device(pts[:4])
    b = M.points_to_device(pts[4:])
    got = M.points_from_device(jax.jit(M.complete_add)(a, b))
    expected = [G1.add(p, q) for p, q in zip(pts[:4], pts[4:])]
    assert got == expected


def test_complete_add_edge_cases():
    p = _host_points(1, 1)[0]
    dev_p = M.points_to_device([p, p, p, None])
    dev_q = M.points_to_device([p, G1.neg(p), None, None])
    got = M.points_from_device(jax.jit(M.complete_add)(dev_p, dev_q))
    assert got == [G1.double(p), None, p, None]


def test_point_double_and_neg():
    p = _host_points(1, 2)[0]
    dev = M.points_to_device([p])
    assert M.points_from_device(jax.jit(M.point_double)(dev)) == [G1.double(p)]
    assert M.points_from_device(M.point_neg(dev)) == [G1.neg(p)]


def test_msm_small_matches_host():
    rng = np.random.default_rng(3)
    n = 13  # also exercises padding
    pts = _host_points(n, 3)
    scalars = [FR.random(rng) for _ in range(n)]
    result = M.msm(M.points_to_device(pts), M.scalars_to_limbs(scalars))
    got = M.points_from_device(result[None])[0]
    assert got == G1.msm(scalars, pts)


def test_msm_with_zero_scalars_and_identity_points():
    pts = _host_points(4, 4) + [None]
    scalars = [5, 0, 7, FR.p - 1, 3]
    result = M.msm(M.points_to_device(pts), M.scalars_to_limbs(scalars))
    got = M.points_from_device(result[None])[0]
    assert got == G1.msm(scalars, pts)


def test_fixed_base_batch_mul():
    table = M.base_table(G1_GEN)
    scalars = [1, 2, 12345, FR.p - 1]
    out = jax.jit(M.fixed_base_batch_mul)(table, M.scalars_to_limbs(scalars))
    got = M.points_from_device(out)
    assert got == [G1.mul(G1_GEN, s) for s in scalars]


def test_plane_sums_list_path_matches_host(monkeypatch):
    """Exercise the TPU (limb-row + fori tail) plane-sums path on CPU: it
    must agree with the host oracle MSM.  Runs eagerly (disable_jit) —
    XLA:CPU takes minutes to compile the wide limb-row graphs, but eager
    execution of the same trace validates the arithmetic in seconds."""
    from delay_enc_tpu.ops import limbs as L

    monkeypatch.setattr(L, "_backend_unrolls", lambda: True)
    rng = np.random.default_rng(9)
    n = 16
    pts = _host_points(n, 9)
    scalars = [FR.random(rng) for _ in range(n)]
    with jax.disable_jit():
        result = M.msm(M.points_to_device(pts), M.scalars_to_limbs(scalars))
        got = M.points_from_device(np.asarray(result)[None])[0]
    assert got == G1.msm(scalars, pts)


def test_stockham_list_path_matches_fallback(monkeypatch):
    """The limb-row Stockham stage (TPU branch) must equal the array/scan
    fallback (CPU branch) bit-for-bit."""
    from delay_enc_tpu.fields import FR as _FR
    from delay_enc_tpu.ops import limbs as L
    from delay_enc_tpu.ops.ntt import NTTPlan, stockham

    rng = np.random.default_rng(10)
    plan = NTTPlan.make(L.FR_CTX, 5)
    a = L.to_device_mont(L.FR_CTX, [_FR.random(rng) for _ in range(32)])
    monkeypatch.setattr(L, "_backend_unrolls", lambda: True)
    with jax.disable_jit():
        got = np.asarray(stockham(L.FR_CTX, a, plan.tw))
    monkeypatch.setattr(L, "_backend_unrolls", lambda: False)
    ref = np.asarray(stockham(L.FR_CTX, a, plan.tw))
    assert (got == ref).all()


@pytest.mark.slow
def test_plane_sums_wide_levels_match_host(monkeypatch):
    """n=256 exercises the UNROLLED wide tree levels (width 128 > TAIL_W)
    of the TPU limb-row path — the n=16 test above only reaches the fori
    tail, so a wide-level bug (u16 inter-level recast, halving slices) was
    previously invisible to the suite.  Eager on CPU (~90 s)."""
    from delay_enc_tpu.ops import limbs as L

    monkeypatch.setattr(L, "_backend_unrolls", lambda: True)
    rng = np.random.default_rng(11)
    n = 256
    pts = _host_points(n, 11)
    scalars = [FR.random(rng) for _ in range(n)]
    with jax.disable_jit():
        result = M.msm(M.points_to_device(pts), M.scalars_to_limbs(scalars))
        got = M.points_from_device(np.asarray(result)[None])[0]
    assert got == G1.msm(scalars, pts)
