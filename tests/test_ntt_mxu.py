"""MXU four-step NTT (ops/ntt_mxu.py) — bit-exactness vs. the Stockham
path (ops/ntt.py) on CPU, including the free scale folds (coset in-scale,
1/n out-mul, zeta^-i out-scale) used by the prover's quotient pipeline."""

import numpy as np
import pytest

import delay_enc_tpu  # noqa: F401  (jax config)
from delay_enc_tpu.fields.bn254 import FR
from delay_enc_tpu.ops import limbs as L
from delay_enc_tpu.ops import ntt as N
from delay_enc_tpu.ops import ntt_mxu as NX

CTX = L.FR_CTX


def _rand_mont(rng, n):
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
            % FR.p for _ in range(n - 2)] + [0, FR.p - 1]
    return np.asarray(CTX.to_mont_np(vals))


@pytest.mark.parametrize("k", [4, 6, 7])
def test_ntt_mxu_matches_stockham(k):
    rng = np.random.default_rng(k)
    n = 1 << k
    a = _rand_mont(rng, n)
    plan = N.NTTPlan.make(CTX, k)
    want = np.asarray(N.ntt(plan, a))
    plan_mxu = NX.make_plan(CTX, k, plan.omega)
    got = np.asarray(NX.ntt_mxu(plan_mxu, a))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [6])
def test_intt_mxu_out_mul(k):
    """Inverse NTT: omega^-1 + the 1/n factor folded into W2."""
    rng = np.random.default_rng(10 + k)
    n = 1 << k
    a = _rand_mont(rng, n)
    plan = N.NTTPlan.make(CTX, k)
    want = np.asarray(N.intt(plan, a))
    omega_inv = FR.inv(plan.omega)
    plan_mxu = NX.make_plan(CTX, k, omega_inv, out_mul=FR.inv(n))
    got = np.asarray(NX.ntt_mxu(plan_mxu, a))
    np.testing.assert_array_equal(got, want)


def test_coset_in_scale_fold():
    """zeta^j input scale folded into W1/T == coset_scale + plain NTT."""
    k, zeta = 6, 5
    rng = np.random.default_rng(99)
    n = 1 << k
    a = _rand_mont(rng, n)
    plan = N.NTTPlan.make(CTX, k)
    zp = N.powers(CTX, zeta, n)
    want = np.asarray(N.ntt(plan, N.coset_scale(CTX, a, zp)))
    plan_mxu = NX.make_plan(CTX, k, plan.omega, in_scale=zeta)
    got = np.asarray(NX.ntt_mxu(plan_mxu, a))
    np.testing.assert_array_equal(got, want)


def test_out_scale_fold():
    """zeta^-i output scale (coset unscale after an iNTT) folded in."""
    k, zeta = 6, 5
    rng = np.random.default_rng(7)
    n = 1 << k
    a = _rand_mont(rng, n)
    plan = N.NTTPlan.make(CTX, k)
    zinv = FR.inv(zeta)
    out = np.asarray(N.intt(plan, a))
    want = np.asarray(L.mont_mul(CTX, out, N.powers(CTX, zinv, n)))
    omega_inv = FR.inv(plan.omega)
    plan_mxu = NX.make_plan(CTX, k, omega_inv, out_mul=FR.inv(n),
                            out_scale=zinv)
    got = np.asarray(NX.ntt_mxu(plan_mxu, a))
    np.testing.assert_array_equal(got, want)


def test_roundtrip():
    k = 7
    rng = np.random.default_rng(3)
    a = _rand_mont(rng, 1 << k)
    plan = N.NTTPlan.make(CTX, k)
    fwd = NX.make_plan(CTX, k, plan.omega)
    bwd = NX.make_plan(CTX, k, FR.inv(plan.omega), out_mul=FR.inv(1 << k))
    back = np.asarray(NX.ntt_mxu(bwd, NX.ntt_mxu(fwd, a)))
    np.testing.assert_array_equal(back, np.asarray(a))


@pytest.mark.slow
def test_prover_mxu_gate_byte_identical(monkeypatch):
    """DELAY_ENC_NTT=mxu routes every prover domain transform through the
    matmul NTT; the proof bytes must match the Stockham path exactly."""
    from delay_enc_tpu.cs import Builder, MainGate, RangeChip, Term
    from delay_enc_tpu.plonk import SRS, create_proof, keygen, verify_proof

    b = Builder(FR)
    mg = MainGate(b)
    rc = RangeChip(b)
    x = mg.assign_value(7)
    y = mg.assign_value(11)
    s = mg.add(x, y)
    m = mg.mul(x, y)
    mg.compose([Term(x, 2), Term(y, 3), Term(s, 1), Term(m, 5)], constant=9)
    rc.assign(45, 2, 6)
    srs = SRS.setup(7, tau=987654321)
    pk, vk = keygen(b, srs)
    want = create_proof(srs, pk, b, np.random.default_rng(5))
    monkeypatch.setenv("DELAY_ENC_NTT", "mxu")
    got = create_proof(srs, pk, b, np.random.default_rng(5))
    assert got == want
    assert verify_proof(srs, vk, got)


def test_redc_barrett_adversarial():
    """Direct unit test of the band-matmul REDC + Barrett tail on adversarial
    inputs: maximal V = n1*(p-1)^2, all-0xFF low bytes, multiples of p,
    values straddling the q-estimate boundaries.  Expected: V*R^-1 mod p."""
    import jax.numpy as jnp

    p = FR.p
    R = 1 << 256
    plan = NX.make_plan(CTX, 4, N.NTTPlan.make(CTX, 4).omega)
    n1_max = 1024
    vals = [
        0, 1, p - 1, p, p + 1, R - 1, R, R * p - 1,
        n1_max * (p - 1) * (p - 1),          # true matmul-pass maximum
        (1 << 518) - 1,                       # design bound
        ((1 << 262) - 1) * R,                 # maximal Barrett X
        (3 * p - 1) * R, (3 * p) * R,         # remainder < 3p edges
        (p - 1) * R,                          # X = canonical boundary
    ]
    rng = np.random.default_rng(0)
    vals += [int(rng.integers(0, 1 << 62)) ** 8 % (1 << 518)
             for _ in range(32)]
    # encode each V over 128 nibble columns: canonical low nibbles with a
    # WIDE top column absorbing bits >= 508 (the kernel's real inputs are
    # schoolbook columns up to ~2^24, so a 518-bit V occupies 128 columns
    # with cols[127] < 2^14 — 128 fully-canonical nibbles hold only 512 bits)
    cols = np.zeros((len(vals), 128), dtype=np.int32)
    for r, v in enumerate(vals):
        for c in range(127):
            cols[r, c] = (v >> (4 * c)) & 0xF
        cols[r, 127] = v >> (4 * 127)
    assert cols.max() < (1 << 24)
    got = np.asarray(NX._redc_barrett(CTX, plan.np_band, plan.p_band,
                                      plan.p_limbs17, plan.mu,
                                      jnp.asarray(cols)))
    want = [(v * pow(R, -1, p)) % p for v in vals]
    got_ints = L.limbs_to_ints_np(got)
    assert got_ints == want
