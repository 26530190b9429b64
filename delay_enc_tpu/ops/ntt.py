"""Radix-2 NTT over Fr limb tensors (device).

TPU-native replacement for `halo2_proofs`' CPU FFT (used inside
create_proof's quotient construction, reference benches/delay_enc.rs:123).
Design:

 * decimation-in-time with a host-precomputed bit-reversal gather and
   per-stage twiddle tables (Montgomery form, device-resident);
 * each stage is one batched `mont_mul` + add/sub over (n/2, 16) limb
   tensors — fully regular VPU work, log2(n) sequential stages;
 * coset (extended-domain) evaluation via a per-index power-of-zeta scale.

The multi-chip four-step variant lives in `delay_enc_tpu.parallel.ntt`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import FieldCtx


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@dataclass(frozen=True)
class NTTPlan:
    ctx: FieldCtx
    k: int
    omega: int  # primitive 2^k-th root of unity (canonical int)
    bitrev: jnp.ndarray  # (n,) int32
    twiddles: tuple  # per stage: (half,16) mont
    inv_twiddles: tuple
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
        tw, itw = [], []
        for s in range(1, k + 1):
            m = 1 << s
            half = m // 2
            w_m = pow(omega, n // m, f.p)
            w_m_inv = pow(omega_inv, n // m, f.p)
            ws, wsi, cur, curi = [], [], 1, 1
            for _ in range(half):
                ws.append(cur)
                wsi.append(curi)
                cur = cur * w_m % f.p
                curi = curi * w_m_inv % f.p
            tw.append(jnp.asarray(ctx.to_mont_np(ws)))
            itw.append(jnp.asarray(ctx.to_mont_np(wsi)))
        return NTTPlan(
            ctx=ctx,
            k=k,
            omega=omega,
            bitrev=jnp.asarray(_bit_reverse_indices(n)),
            twiddles=tuple(tw),
            inv_twiddles=tuple(itw),
            n_inv=jnp.asarray(ctx.to_mont_np([f.inv(n)])[0]),
        )


def _core(plan: NTTPlan, a: jnp.ndarray, twiddles) -> jnp.ndarray:
    ctx = plan.ctx
    n = plan.n
    a = jnp.take(a, plan.bitrev, axis=0)
    for s in range(1, plan.k + 1):
        m = 1 << s
        half = m // 2
        tw = twiddles[s - 1]  # (half,16)
        a = a.reshape(n // m, 2, half, L.NLIMB)
        u = a[:, 0]
        v = L.mont_mul(ctx, a[:, 1], tw[None, :, :])
        a = jnp.stack([L.add(ctx, u, v), L.sub(ctx, u, v)], axis=1)
    return a.reshape(n, L.NLIMB)


def ntt(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations over the 2^k subgroup (Montgomery limbs)."""
    return _core(plan, a, plan.twiddles)


def intt(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Evaluations -> coefficients."""
    out = _core(plan, a, plan.inv_twiddles)
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
