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
    omega_pows: jnp.ndarray  # (n/2,16) mont powers of omega
    omega_inv_pows: jnp.ndarray
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
        ws, wsi, cur, curi = [], [], 1, 1
        for _ in range(max(1, n // 2)):
            ws.append(cur)
            wsi.append(curi)
            cur = cur * omega % f.p
            curi = curi * omega_inv % f.p
        return NTTPlan(
            ctx=ctx,
            k=k,
            omega=omega,
            bitrev=jnp.asarray(_bit_reverse_indices(n)),
            omega_pows=jnp.asarray(ctx.to_mont_np(ws)),
            omega_inv_pows=jnp.asarray(ctx.to_mont_np(wsi)),
            n_inv=jnp.asarray(ctx.to_mont_np([f.inv(n)])[0]),
        )


def _core(plan: NTTPlan, a: jnp.ndarray, omega_pows: jnp.ndarray) -> jnp.ndarray:
    """Iterative DIT with bit-reversed input, expressed as a lax.scan over
    the k stages with fixed shapes: partner exchange is an XOR gather,
    twiddles are gathered from the shared power table — one traced stage
    body, ~20 primitives, regardless of k (XLA compile time is the scarce
    resource for these integer graphs)."""
    ctx = plan.ctx
    n = plan.n
    k = plan.k
    a = jnp.take(a, plan.bitrev, axis=0)
    idx = jnp.arange(n, dtype=jnp.int32)

    def stage(a, s):
        half = jnp.int32(1) << (s - 1)
        partner = idx ^ half
        is_hi = (idx & half) != 0
        tw_idx = (idx & (half - 1)) << (k - s)
        w = jnp.take(omega_pows, tw_idx, axis=0)
        y = jnp.take(a, partner, axis=0)
        t_in = jnp.where(is_hi[:, None], a, y)
        t = L.mont_mul(ctx, w, t_in)
        out = jnp.where(is_hi[:, None], L.sub(ctx, y, t), L.add(ctx, a, t))
        return out, None

    a, _ = jax.lax.scan(stage, a, jnp.arange(1, k + 1, dtype=jnp.int32))
    return a


def ntt(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations over the 2^k subgroup (Montgomery limbs)."""
    return _core(plan, a, plan.omega_pows)


def intt(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Evaluations -> coefficients."""
    out = _core(plan, a, plan.omega_inv_pows)
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
