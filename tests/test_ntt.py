import numpy as np

import jax

from delay_enc_tpu.fields import FR
from delay_enc_tpu.ops import limbs as L
from delay_enc_tpu.ops.ntt import NTTPlan, intt, ntt, powers


def _host_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def test_ntt_matches_host_eval():
    k = 4
    plan = NTTPlan.make(L.FR_CTX, k)
    rng = np.random.default_rng(0)
    coeffs = [FR.random(rng) for _ in range(1 << k)]
    a = L.to_device_mont(L.FR_CTX, coeffs)
    evals = L.from_device_mont(L.FR_CTX, jax.jit(lambda x: ntt(plan, x))(a))
    w = plan.omega
    expected = [_host_eval(coeffs, pow(w, i, FR.p), FR.p) for i in range(1 << k)]
    assert evals == expected


def test_ntt_intt_roundtrip():
    k = 6
    plan = NTTPlan.make(L.FR_CTX, k)
    rng = np.random.default_rng(1)
    coeffs = [FR.random(rng) for _ in range(1 << k)]
    a = L.to_device_mont(L.FR_CTX, coeffs)
    back = L.from_device_mont(L.FR_CTX, jax.jit(lambda x: intt(plan, ntt(plan, x)))(a))
    assert back == coeffs


def test_ntt_jits():
    k = 5
    plan = NTTPlan.make(L.FR_CTX, k)
    rng = np.random.default_rng(2)
    coeffs = [FR.random(rng) for _ in range(1 << k)]
    a = L.to_device_mont(L.FR_CTX, coeffs)
    f = jax.jit(lambda x: intt(plan, ntt(plan, x)))
    assert L.from_device_mont(L.FR_CTX, f(a)) == coeffs


def test_coset_eval():
    # evaluating after scaling coeffs by zeta^i equals eval at zeta*w^i
    from delay_enc_tpu.ops.ntt import coset_scale

    k = 3
    plan = NTTPlan.make(L.FR_CTX, k)
    rng = np.random.default_rng(3)
    coeffs = [FR.random(rng) for _ in range(1 << k)]
    zeta = FR.generator
    zp = powers(L.FR_CTX, zeta, 1 << k)
    a = L.to_device_mont(L.FR_CTX, coeffs)
    evals = L.from_device_mont(
        L.FR_CTX, jax.jit(lambda x: ntt(plan, coset_scale(L.FR_CTX, x, zp)))(a)
    )
    expected = [
        _host_eval(coeffs, zeta * pow(plan.omega, i, FR.p) % FR.p, FR.p)
        for i in range(1 << k)
    ]
    assert evals == expected
