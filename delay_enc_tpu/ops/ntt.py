"""Radix-2 NTT over Fr limb tensors (device) — Stockham autosort.

TPU-native replacement for `halo2_proofs`' CPU FFT (used inside
create_proof's quotient construction, reference benches/delay_enc.rs:123).

Design (v2 — rebuilt from device profiling):

 * **Stockham autosort DIF**: natural-order input AND output, no
   bit-reversal permutation and — critically — **no gathers**.  Random-row
   gathers run ~50x below HBM bandwidth on TPU; every Stockham stage is
   expressed purely as reshapes, contiguous half-slices, one batched
   `mont_mul`, and one interleave (stack+reshape), all of which XLA fuses
   or executes at full memory bandwidth.
 * Stage t (l groups of m columns, l*m = n/2): with x viewed as (2l, m):
       y[j, 0, k] = x[j, k] + x[j+l, k]
       y[j, 1, k] = w^(j*m) * (x[j, k] - x[j+l, k])
   where w is the primitive n-th root.  Twiddles are host-precomputed per
   stage (Montgomery form) and passed as jit ARGUMENTS (closure-captured
   device constants get re-shipped per call by some PJRT transports).
 * Stages are unrolled in the trace (static shapes per stage); the limb
   arithmetic uses the unrolled chains, which XLA fuses into near
   speed-of-light elementwise kernels.
 * Coset (extended-domain) evaluation via a per-index power-of-zeta scale.

The multi-chip four-step variant lives in `delay_enc_tpu.parallel.ntt`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import FieldCtx


@dataclass(frozen=True)
class NTTPlan:
    ctx: FieldCtx
    k: int
    omega: int  # primitive 2^k-th root of unity (canonical int)
    # per-stage twiddle tables, Montgomery form; tw[t] has n/2^(t+1) rows
    tw: tuple
    tw_inv: tuple
    n_inv: jnp.ndarray  # (16,) mont of 1/n

    @property
    def n(self) -> int:
        return 1 << self.k

    @staticmethod
    def make(ctx: FieldCtx, k: int, omega: int | None = None) -> "NTTPlan":
        f = ctx.field
        n = 1 << k
        if omega is None:
            omega = f.root_of_unity(k)
        omega_inv = f.inv(omega)

        def stage_tables(w):
            # all powers w^0..w^(n/2-1) once, then stride-sampled per stage
            pows = [1] * max(1, n // 2)
            for i in range(1, len(pows)):
                pows[i] = pows[i - 1] * w % f.p
            mont = ctx.to_mont_np(pows)
            out = []
            l, m = n // 2, 1
            while l >= 1:
                out.append(jnp.asarray(mont[: l * m : m]))  # w^(j*m), j<l
                l //= 2
                m *= 2
            return tuple(out)

        return NTTPlan(
            ctx=ctx,
            k=k,
            omega=omega,
            tw=stage_tables(omega),
            tw_inv=stage_tables(omega_inv),
            n_inv=jnp.asarray(ctx.to_mont_np([f.inv(n)])[0]),
        )


def stockham(ctx: FieldCtx, a: jnp.ndarray, tws) -> jnp.ndarray:
    """Natural-order radix-2 NTT; a: (n, 16), tws: per-stage twiddles.

    Each stage runs the butterfly in limb-row form (pure elementwise — one
    fused XLA kernel group), then packs and interleaves once; the only
    structural data movement per stage is that single (l, 2, m, 16) stack."""
    n = a.shape[0]
    k = n.bit_length() - 1
    l, m = n // 2, 1
    if not L._backend_unrolls():
        # compact array/scan form for CPU (fast compiles)
        for t in range(k):
            x3 = a.reshape(2 * l, m, L.NLIMB)
            c0, c1 = x3[:l], x3[l:]
            s = L.add(ctx, c0, c1)
            d = L.mont_mul(ctx, tws[t][:, None, :], L.sub(ctx, c0, c1))
            a = jnp.stack([s, d], axis=1).reshape(n, L.NLIMB)
            l //= 2
            m *= 2
        return a
    for t in range(k):
        rows = [a[..., i].reshape(2 * l, m) for i in range(L.NLIMB)]
        c0 = [r[:l] for r in rows]
        c1 = [r[l:] for r in rows]
        tw = [tws[t][:, i][:, None] for i in range(L.NLIMB)]  # (l, 1)
        s = L.ll_add(ctx, c0, c1)
        d = L.ll_mont_mul(ctx, tw, L.ll_sub(ctx, c0, c1))
        a = jnp.stack([L.pack(s), L.pack(d)], axis=1).reshape(n, L.NLIMB)
        l //= 2
        m *= 2
    return a


def ntt(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations over the 2^k subgroup (Montgomery limbs).
    Output in natural order (A[j] = a(omega^j))."""
    return stockham(plan.ctx, a, plan.tw)


def intt(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Evaluations -> coefficients."""
    out = stockham(plan.ctx, a, plan.tw_inv)
    return L.mont_mul(plan.ctx, out, plan.n_inv[None, :])


def powers(ctx: FieldCtx, base: int, n: int) -> jnp.ndarray:
    """(n,16) Montgomery limbs of [1, base, base^2, ...] (host precompute)."""
    f = ctx.field
    vals, cur = [], 1
    for _ in range(n):
        vals.append(cur)
        cur = cur * base % f.p
    return jnp.asarray(ctx.to_mont_np(vals))


def coset_scale(ctx: FieldCtx, coeffs: jnp.ndarray, zeta_powers: jnp.ndarray) -> jnp.ndarray:
    """coeff_i *= zeta^i — evaluate on the coset zeta*H via plain NTT after."""
    return L.mont_mul(ctx, coeffs, zeta_powers)
