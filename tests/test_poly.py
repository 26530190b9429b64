"""Device polynomial helper tests — the work-efficient block scan must be
bit-identical to the Hillis-Steele scan and to a host bigint oracle (the
grand-product z polynomials feed the transcript, so any difference changes
proof bytes)."""

import os

import numpy as np
import pytest

from delay_enc_tpu.fields import FR
from delay_enc_tpu.ops import limbs as L
from delay_enc_tpu.ops import poly as P

CTX = L.FR_CTX


def _rand_mont(rng, n):
    vals = [FR.random(rng) for _ in range(n)]
    return vals, np.asarray(CTX.to_mont_np(vals))


@pytest.mark.parametrize("n", [8, 16, 64, 256, 1024, 16384])
def test_prefix_product_matches_host_oracle(n):
    rng = np.random.default_rng(n)
    vals, mont = _rand_mont(rng, n)
    out = np.asarray(P.prefix_product(CTX, mont))
    acc, expect = 1, []
    for v in vals:
        acc = acc * v % FR.p
        expect.append(acc)
    got = CTX.from_mont_np(out)
    assert list(got) == expect


@pytest.mark.parametrize("n", [16, 128, 16384])
def test_suffix_product_matches_host_oracle(n):
    rng = np.random.default_rng(n + 7)
    vals, mont = _rand_mont(rng, n)
    out = np.asarray(P.suffix_product(CTX, mont))
    expect = [0] * n
    acc = 1
    for i in range(n - 1, -1, -1):
        acc = acc * vals[i] % FR.p
        expect[i] = acc
    got = CTX.from_mont_np(out)
    assert list(got) == expect


def test_block_scan_bit_identical_to_hs(monkeypatch):
    rng = np.random.default_rng(3)
    _, mont = _rand_mont(rng, 16384)
    block = np.asarray(P.prefix_product(CTX, mont))
    monkeypatch.setenv("DELAY_ENC_SCAN", "hs")
    hs = np.asarray(P.prefix_product(CTX, mont))
    assert np.array_equal(block, hs)


def test_prefix_product_small_and_odd_sizes():
    # sizes below / not divisible by the block width take the HS path
    for n in (2, 4, 24):
        rng = np.random.default_rng(100 + n)
        vals, mont = _rand_mont(rng, n)
        got = CTX.from_mont_np(np.asarray(P.prefix_product(CTX, mont)))
        acc, expect = 1, []
        for v in vals:
            acc = acc * v % FR.p
            expect.append(acc)
        assert list(got) == expect


@pytest.mark.parametrize("n", [8, 64, 16384])
def test_suffix_sum_matches_host_oracle(n):
    rng = np.random.default_rng(n + 31)
    vals, mont = _rand_mont(rng, n)
    # suffix_sum operates on Montgomery residues; sums commute with the
    # R-scaling so the host oracle is a plain modular suffix sum
    out = CTX.from_mont_np(np.asarray(P.suffix_sum(CTX, mont)))
    expect = [0] * n
    acc = 0
    for i in range(n - 1, -1, -1):
        acc = (acc + vals[i]) % FR.p
        expect[i] = acc
    assert list(out) == expect


def test_gp_kernels_block_vs_hs_bit_identical(monkeypatch):
    """The grand-product kernels feed the transcript; the block scan must
    leave proof bytes unchanged, so partials+finish must be bit-identical
    between implementations at a block-path size."""
    import jax.numpy as jnp

    from delay_enc_tpu.plonk import kernels as K

    n = 16384
    rng = np.random.default_rng(9)
    num = np.stack([_rand_mont(rng, n)[1] for _ in range(2)])
    den = np.stack([_rand_mont(rng, n)[1] for _ in range(2)])
    active = np.zeros(n, dtype=bool)
    active[: n - 7] = True
    blind = np.stack([_rand_mont(rng, 7)[1] for _ in range(2)])
    outs = {}
    for impl in ("block", "hs"):
        monkeypatch.setenv("DELAY_ENC_SCAN", impl)
        num_a, pre, suf, totals = K._jit_gp_partials_batch(
            jnp.asarray(num), jnp.asarray(den), jnp.asarray(active))
        total_inv = np.stack([
            np.asarray(CTX.to_mont_np(
                [pow(CTX.from_mont_np(np.asarray(t)[None, :])[0], -1, FR.p)]
            ))[0]
            for t in totals
        ])
        z = K._jit_gp_finish_batch(num_a, pre, suf, jnp.asarray(total_inv),
                                   jnp.asarray(blind))
        outs[impl] = np.asarray(z)
    assert np.array_equal(outs["block"], outs["hs"])
