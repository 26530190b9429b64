"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest sets jax_num_cpu_devices=8): sharded MSM == single-chip MSM,
sharded NTT/iNTT == single-chip NTT, batch commit == per-poly MSM."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes of XLA:CPU compile

import jax
import jax.numpy as jnp

from delay_enc_tpu.curves.bn254 import G1, G1_GEN
from delay_enc_tpu.fields import FR
from delay_enc_tpu.ops import limbs as L
from delay_enc_tpu.ops import msm as M
from delay_enc_tpu.ops.ntt import NTTPlan, ntt
from delay_enc_tpu.parallel import batch_commit, make_mesh, sharded_msm, sharded_ntt
from delay_enc_tpu.parallel.ntt import ShardedNTTPlan, sharded_intt


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "tests need the 8-device CPU mesh"
    return make_mesh(8)


def test_sharded_msm_matches_host(mesh):
    rng = np.random.default_rng(0)
    n = 16
    pts = [G1.mul(G1_GEN, int(rng.integers(1, 1 << 60))) for _ in range(n)]
    scalars = [FR.random(rng) for _ in range(n)]
    out = sharded_msm(mesh, M.points_to_device(pts), M.scalars_to_limbs(scalars))
    got = M.points_from_device(out[None])[0]
    assert got == G1.msm(scalars, pts)


def test_sharded_ntt_matches_single_chip(mesh):
    k = 7  # N=128, D=8, L=16
    plan = ShardedNTTPlan.make(k, 8)
    single = NTTPlan.make(L.FR_CTX, k)
    rng = np.random.default_rng(1)
    coeffs = [FR.random(rng) for _ in range(1 << k)]
    a = L.to_device_mont(L.FR_CTX, coeffs)
    got = sharded_ntt(mesh, plan, a)
    expected = jax.jit(lambda x: ntt(single, x))(a)
    assert L.from_device_mont(L.FR_CTX, got) == L.from_device_mont(L.FR_CTX, expected)


def test_sharded_intt_roundtrip(mesh):
    k = 7
    plan = ShardedNTTPlan.make(k, 8)
    rng = np.random.default_rng(2)
    coeffs = [FR.random(rng) for _ in range(1 << k)]
    a = L.to_device_mont(L.FR_CTX, coeffs)
    back = sharded_intt(mesh, plan, sharded_ntt(mesh, plan, a))
    assert L.from_device_mont(L.FR_CTX, back) == coeffs


def test_batch_commit_matches_serial(mesh):
    rng = np.random.default_rng(3)
    n, batch = 8, 8
    pts = [G1.mul(G1_GEN, int(rng.integers(1, 1 << 50))) for _ in range(n)]
    g1 = M.points_to_device(pts)
    scalars = [[FR.random(rng) for _ in range(n)] for _ in range(batch)]
    coeffs = jnp.stack([M.scalars_to_limbs(s) for s in scalars])
    out = batch_commit(mesh, g1, coeffs)
    got = M.points_from_device(out)
    expected = [G1.msm(s, pts) for s in scalars]
    assert got == expected
