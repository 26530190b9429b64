"""Base-16 pair-table MSM (ops/msm16.py) vs the host group oracle.

Covers both backend branches of the plane-sum kernel: the array/scan CPU
form (jitted) and the TPU limb-row form (eagerly, with the backend check
monkeypatched — the pattern of tests/test_msm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from delay_enc_tpu.curves.bn254 import G1, G1_GEN
from delay_enc_tpu.fields.bn254 import FR
from delay_enc_tpu.ops import limbs as L
from delay_enc_tpu.ops import msm as M
from delay_enc_tpu.ops import msm16 as M16


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n = 8
    pts = [G1.mul(G1_GEN, int(rng.integers(1, 1 << 60))) for _ in range(n)]
    scalars = [int(FR.random(rng)) for _ in range(n)]
    scalars[3] = 0  # zero scalar
    pts_dev = M.points_to_device(pts)
    return pts, scalars, pts_dev


def test_msm16_matches_oracle(setup):
    pts, scalars, pts_dev = setup
    expect = G1.msm(scalars, pts)
    got = M16.msm16(pts_dev, M.scalars_to_limbs(scalars))
    assert got[0] == expect


def test_msm16_batch(setup):
    pts, _, pts_dev = setup
    rng = np.random.default_rng(6)
    sc2 = [[int(FR.random(rng)) for _ in range(len(pts))] for _ in range(2)]
    limbs2 = jnp.stack([M.scalars_to_limbs(s) for s in sc2])
    tab = M16._jit_pair_tables16(pts_dev)
    got = M16.msm16_with_tables(M16._jit_tables_to_i8(tab), limbs2)
    for g, s in zip(got, sc2):
        assert g == G1.msm(s, pts)


def test_msm16_limb_row_branch(setup, monkeypatch):
    """The TPU limb-row tree (selection dot + _tree_reduce_rows) must agree
    with the oracle; runs eagerly so XLA:CPU never sees the wide graphs."""
    pts, scalars, pts_dev = setup
    expect = G1.msm(scalars, pts)
    monkeypatch.setattr(L, "_backend_unrolls", lambda: True)
    with jax.disable_jit():
        got = M16.msm16(pts_dev, M.scalars_to_limbs(scalars))
    assert got[0] == expect


def test_pair_sel16_digits():
    """Selectors must encode (d_even + 16*d_odd) base-16 scalar digits."""
    s0, s1 = 0x1234567890ABCDEF, 0xFEDCBA0987654321
    sel = np.asarray(M16._jit_pair_sel16(M.scalars_to_limbs([s0, s1])[None]))[0]
    for plane in range(16):
        d0 = (s0 >> (4 * plane)) & 0xF
        d1 = (s1 >> (4 * plane)) & 0xF
        assert sel[plane, 0] == d0 + 16 * d1
    assert sel.shape == (M16.PLANES, 1)
    assert np.all(sel[16:] == 0)
