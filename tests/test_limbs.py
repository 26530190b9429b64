import numpy as np
import pytest

import jax

from delay_enc_tpu.fields import FQ, FR
from delay_enc_tpu.ops import limbs as L


@pytest.fixture(params=["fr", "fq"])
def ctx(request):
    return L.FR_CTX if request.param == "fr" else L.FQ_CTX


def _rand_elems(ctx, n, seed=0):
    rng = np.random.default_rng(seed)
    return [ctx.field.random(rng) for _ in range(n)]


def test_limb_conversion_roundtrip(ctx):
    xs = _rand_elems(ctx, 7)
    a = L.ints_to_limbs_np(xs)
    assert L.limbs_to_ints_np(a) == xs


def test_mont_roundtrip(ctx):
    xs = _rand_elems(ctx, 5)
    a = L.to_device_mont(ctx, xs)
    assert L.from_device_mont(ctx, a) == xs


def test_add_sub_neg(ctx):
    xs = _rand_elems(ctx, 64, 1)
    ys = _rand_elems(ctx, 64, 2)
    a = L.to_device_mont(ctx, xs)
    b = L.to_device_mont(ctx, ys)
    p = ctx.field.p

    @jax.jit
    def f(a, b):
        return L.add(ctx, a, b), L.sub(ctx, a, b), L.neg(ctx, a)

    s, d, n = f(a, b)
    assert L.from_device_mont(ctx, s) == [(x + y) % p for x, y in zip(xs, ys)]
    assert L.from_device_mont(ctx, d) == [(x - y) % p for x, y in zip(xs, ys)]
    assert L.from_device_mont(ctx, n) == [(-x) % p for x in xs]


def test_mont_mul_matches_host(ctx):
    xs = _rand_elems(ctx, 128, 3)
    ys = _rand_elems(ctx, 128, 4)
    a = L.to_device_mont(ctx, xs)
    b = L.to_device_mont(ctx, ys)
    got = L.from_device_mont(ctx, jax.jit(lambda a, b: L.mont_mul(ctx, a, b))(a, b))
    assert got == [(x * y) % ctx.field.p for x, y in zip(xs, ys)]


def test_mont_mul_edge_cases(ctx):
    p = ctx.field.p
    xs = [0, 1, p - 1, p - 2, 2, (1 << 255) % p, p - 1, p - 1]
    ys = [p - 1, p - 1, p - 1, 1, 0, (1 << 254) % p, p - 1, 1]
    a = L.to_device_mont(ctx, xs)
    b = L.to_device_mont(ctx, ys)
    got = L.from_device_mont(ctx, jax.jit(lambda a, b: L.mont_mul(ctx, a, b))(a, b))
    assert got == [(x * y) % p for x, y in zip(xs, ys)]


def test_mont_pow_and_inv(ctx):
    xs = _rand_elems(ctx, 8, 5)
    a = L.to_device_mont(ctx, xs)
    p = ctx.field.p
    cubes = L.from_device_mont(ctx, jax.jit(lambda a: L.mont_pow(ctx, a, 3))(a))
    assert cubes == [pow(x, 3, p) for x in xs]
    invs = L.from_device_mont(ctx, jax.jit(lambda a: L.inv(ctx, a))(a))
    assert invs == [pow(x, -1, p) for x in xs]


def test_batch_inv(ctx):
    xs = _rand_elems(ctx, 33, 6)
    xs[7] = 0  # zero maps to zero
    a = L.to_device_mont(ctx, xs)
    got = L.from_device_mont(ctx, jax.jit(lambda a: L.batch_inv(ctx, a))(a))
    p = ctx.field.p
    expected = [pow(x, -1, p) if x else 0 for x in xs]
    assert got == expected


def test_ops_jit_and_batch_shapes(ctx):
    xs = _rand_elems(ctx, 24, 7)
    a = L.to_device_mont(ctx, xs).reshape(2, 3, 4, L.NLIMB)

    @jax.jit
    def f(v):
        return L.mont_mul(ctx, v, L.add(ctx, v, v))

    out = f(a)
    assert out.shape == a.shape
    p = ctx.field.p
    got = L.from_device_mont(ctx, out.reshape(-1, L.NLIMB))
    assert got == [(x * 2 * x) % p for x in xs]
