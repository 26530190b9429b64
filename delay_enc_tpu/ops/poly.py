"""Device polynomial helpers for the prover.

All sequential-looking pieces (grand products, batched inversion, powers of
a point) avoid 2^k-long scans, which would be latency-bound on TPU.  Large
scans (n >= 8192) use a work-efficient two-level block form (~2n ops);
small ones use log-depth Hillis-Steele ladders (log2(n) full-width steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limbs as L
from .limbs import FieldCtx


_SCAN_BLOCK = 16  # rows per block in the work-efficient scan
# Below this row count the scans are latency-bound (k<=12 proofs): the
# Hillis-Steele ladder's log2(n) sequential steps beat the block form's
# ~2*B sequential steps, and the n*log n work is tiny anyway.
_SCAN_MIN_N = 8192


def _prefix_product_hs(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Hillis-Steele inclusive scan: log2(n) rounds of shifted multiplies.
    n*log2(n) total work — used only for small n (block totals) or via
    DELAY_ENC_SCAN=hs as the bisect fallback."""
    n = a.shape[0]
    one = jnp.broadcast_to(ctx.one_mont(), a.shape)
    s = 1
    while s < n:
        shifted = jnp.concatenate([one[:s], a[:-s]], axis=0)
        a = L.mont_mul(ctx, a, shifted)
        s *= 2
    return a


def scan_impl_env() -> str:
    """Current scan implementation choice ('block' default, 'hs' fallback).
    Read at jit-callable SELECTION time by plonk.kernels (not inside a
    traced body, where an env read would freeze at first trace and defeat
    the daemon's in-process `setenv` bisect)."""
    import os

    return os.environ.get("DELAY_ENC_SCAN", "block")


def prefix_product(
    ctx: FieldCtx, a: jnp.ndarray, impl: str | None = None
) -> jnp.ndarray:
    """Inclusive prefix products along axis 0: out[i] = a[0]*...*a[i].

    Work-efficient two-level block scan (~2n multiplies): per-block
    inclusive prefixes ((B-1) vectorized rounds over n/B rows), a
    recursive scan of the n/B block totals, then one broadcast multiply.
    The Hillis-Steele form (n*log2 n work — 16n at k=16) measured as the
    bulk of the 1.29 s grand-product phase on TPU (docs/PERF.md round-4
    phase table); the block form does the same grand products in ~2n.
    """
    n = a.shape[0]
    B = _SCAN_BLOCK
    if impl is None:
        impl = scan_impl_env()
    if n < _SCAN_MIN_N or n % B or impl == "hs":
        return _prefix_product_hs(ctx, a)
    blocks = a.reshape(n // B, B, L.NLIMB)
    cols = [blocks[:, 0]]
    for j in range(1, B):
        cols.append(L.mont_mul(ctx, cols[-1], blocks[:, j]))
    pref = jnp.stack(cols, axis=1)  # (n/B, B, 16) in-block inclusive
    tot_incl = prefix_product(ctx, cols[-1], impl)  # scan of block totals
    one = jnp.broadcast_to(ctx.one_mont(), (1, L.NLIMB))
    tot_excl = jnp.concatenate([one, tot_incl[:-1]], axis=0)
    out = L.mont_mul(ctx, pref, tot_excl[:, None, :])
    return out.reshape(n, L.NLIMB)


def suffix_product(
    ctx: FieldCtx, a: jnp.ndarray, impl: str | None = None
) -> jnp.ndarray:
    return prefix_product(ctx, a[::-1], impl)[::-1]


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
    suf = suffix_sum(ctx, t)
    # b_i = suf[i+1] * zinv^(i+1)
    zero = jnp.zeros_like(t)
    suf_shift = jnp.concatenate([suf[1:], zero[:1]], axis=0)
    b = L.mont_mul(ctx, suf_shift, zinv_powers[1 : n + 1])
    return b


def suffix_sum(ctx: FieldCtx, t: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sums mod p along axis 0 (suf[i] = sum_{j>=i} t[j]),
    work-efficient two-level block form (~2n adds vs the shifted-ladder's
    n*log2 n)."""
    n = t.shape[0]
    B = _SCAN_BLOCK
    if n < _SCAN_MIN_N or n % B:
        # log-depth shifted-add ladder for small/odd sizes
        s = 1
        suf = t
        zero = jnp.zeros_like(t)
        while s < n:
            shifted = jnp.concatenate([suf[s:], zero[:s]], axis=0)
            suf = L.add(ctx, suf, shifted)
            s *= 2
        return suf
    blocks = t.reshape(n // B, B, L.NLIMB)
    cols = [blocks[:, B - 1]]
    for j in range(B - 2, -1, -1):
        cols.append(L.add(ctx, cols[-1], blocks[:, j]))
    cols.reverse()
    suf_in = jnp.stack(cols, axis=1)  # (n/B, B, 16) in-block inclusive
    tot_incl = suffix_sum(ctx, cols[0])  # (n/B, 16) block-total suffixes
    zero1 = jnp.zeros((1, L.NLIMB), suf_in.dtype)
    tot_excl = jnp.concatenate([tot_incl[1:], zero1], axis=0)
    out = L.add(ctx, suf_in, tot_excl[:, None, :])
    return out.reshape(n, L.NLIMB)
