"""Device polynomial helpers for the prover.

All sequential-looking pieces (grand products, batched inversion, powers of a
point) are log-depth Hillis-Steele formulations — 2^k-long scans would be
latency-bound on TPU, log2(n) full-width vector steps are not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limbs as L
from .limbs import FieldCtx


def prefix_product(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix products along axis 0: out[i] = a[0]*...*a[i].
    log2(n) rounds of shifted multiplies."""
    n = a.shape[0]
    one = jnp.broadcast_to(ctx.one_mont(), a.shape)
    s = 1
    while s < n:
        shifted = jnp.concatenate([one[:s], a[:-s]], axis=0)
        a = L.mont_mul(ctx, a, shifted)
        s *= 2
    return a


def suffix_product(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return prefix_product(ctx, a[::-1])[::-1]


def batch_inv_log(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion in log depth: d_i^-1 = prefix_{i-1} * suffix_{i+1}
    * total^-1.  Zero entries map to zero."""
    zero_mask = L.is_zero(a)
    one = jnp.broadcast_to(ctx.one_mont(), a.shape)
    a_safe = L.select(zero_mask, one, a)
    pre = prefix_product(ctx, a_safe)
    suf = suffix_product(ctx, a_safe)
    total_inv = L.inv(ctx, pre[-1:])  # (1,16)
    pre_excl = jnp.concatenate([one[:1], pre[:-1]], axis=0)
    suf_excl = jnp.concatenate([suf[1:], one[:1]], axis=0)
    out = L.mont_mul(ctx, L.mont_mul(ctx, pre_excl, suf_excl), total_inv)
    return L.select(zero_mask, jnp.zeros_like(a), out)


def powers_of(ctx: FieldCtx, x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(n-1)] from a single (16,) Montgomery element,
    via log2(n) doubling steps."""
    p = jnp.stack([ctx.one_mont(), x])
    while p.shape[0] < n:
        m = p.shape[0]
        x_m = L.mont_mul(ctx, p[-1:], x[None])  # (1,16) = x^m
        p = jnp.concatenate([p, L.mont_mul(ctx, p, jnp.broadcast_to(x_m, p.shape))], axis=0)
    return p[:n]


def eval_poly(ctx: FieldCtx, coeffs: jnp.ndarray, x_powers: jnp.ndarray) -> jnp.ndarray:
    """Evaluate coeff-form poly at the point whose powers are given:
    sum_i c_i * x^i -> (16,)."""
    prods = L.mont_mul(ctx, coeffs, x_powers[: coeffs.shape[0]])
    # tree reduction of the modular sum
    n = prods.shape[0]
    while n > 1:
        half = n // 2
        lo, hi = prods[:half], prods[half : 2 * half]
        s = L.add(ctx, lo, hi)
        if n % 2:
            s = jnp.concatenate([s, prods[-1:]], axis=0)
        prods = s
        n = prods.shape[0]
    return prods[0]


def divide_by_linear(
    ctx: FieldCtx, coeffs: jnp.ndarray, z_powers: jnp.ndarray, zinv_powers: jnp.ndarray
) -> jnp.ndarray:
    """(f(X) - f(z)) / (X - z) in coefficient form, log-depth.

    b_i = sum_{j>i} a_j z^{j-i-1} = (suffix-sum of a_j z^j at i+1) * z^{-(i+1)}.
    Requires z != 0 (challenges are nonzero w.h.p.).  Returns n-1 coeffs
    padded with a zero to length n."""
    n = coeffs.shape[0]
    t = L.mont_mul(ctx, coeffs, z_powers[:n])
    # suffix sums via log-depth shifted adds
    s = 1
    suf = t
    zero = jnp.zeros_like(t)
    while s < n:
        shifted = jnp.concatenate([suf[s:], zero[:s]], axis=0)
        suf = L.add(ctx, suf, shifted)
        s *= 2
    # b_i = suf[i+1] * zinv^(i+1)
    suf_shift = jnp.concatenate([suf[1:], zero[:1]], axis=0)
    b = L.mont_mul(ctx, suf_shift, zinv_powers[1 : n + 1])
    return b
