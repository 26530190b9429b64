"""MXU (systolic-array) NTT over Fr limb tensors — four-step DFT as matmuls.

TPU-native replacement for the VPU-bound Stockham path (ops/ntt.py) on the
prover's large domains (reference workload: halo2's FFTs inside
create_proof, benches/delay_enc.rs:123).  Measured round-4 roofline
(docs/ROADMAP.md): every Stockham butterfly multiply is a ~512-MAC
Montgomery product on the VPU (~175 GMAC/s sustained); the MXU sits idle.
This module moves the multiply mass onto the MXU:

 * **Four-step decomposition** n = n1*n2 (both <= 1024):
       y[i1 + n1*i2] = sum_j2 W2[i2,j2] * ( T[i1,j2] *
                       sum_j1 W1[i1,j1] * A[j1,j2] )
   with W1 = omega^(n2*i1*j1), W2 = omega^(n1*i2*j2), T = omega^(i1*j2),
   A = a.reshape(n1, n2).  Steps 1 and 3 are *matrices of fixed field
   constants* — they run as MXU matmuls.  Only step 2 stays an
   elementwise VPU `mont_mul` (one per element, vs. (log2 n)/2 per
   element along the Stockham ladder).
 * **Exact integer matmuls in bf16**: each 256-bit operand splits into 64
   4-bit nibbles.  A full nibble-schoolbook column accumulates at most
   n1 * 64 * 15 * 15 < 2^24, so bf16 inputs with f32 accumulation are
   EXACT on the MXU (the f32 mantissa holds every partial sum).  The 64
   fixed-operand planes stream as 64 chunky (n1 x n1) @ (n1, n2*64) dots.
 * **Montgomery reduction as band matmuls**: the raw schoolbook columns V
   of sum_j W~[i,j]*x~[j] (W~ stored in Montgomery form, so REDC
   preserves the Montgomery scaling of x~) reduce via
       m  = (V mod R) * (-p^-1 mod R) mod R   (32x32 byte-band matmul)
       V' = (V + m*p) >> 256                  (32x64 byte-band matmul)
   with byte-products accumulating < 32*255^2 < 2^24 (bf16/f32-exact),
   then a tiny Barrett tail (V' < 2^262: q = (floor(V'/2^250)*mu) >> 20,
   V' - q*p < 3p) brings the value canonical.  The only sequential VPU
   work left is short masked-carry passes and ~17-step exact chains.
 * **Free scale folding**: coset scales zeta^j fold into W1's columns and
   T; 1/n and per-output scales zeta^-i fold into W2's rows and T.  The
   separate `coset_scale` elementwise multiply disappears entirely.

Gated by DELAY_ENC_NTT=mxu (default: the Stockham path) until the TPU
timing decision is banked; exactness vs. ops/ntt.py is asserted bit-for-
bit in tests/test_ntt_mxu.py on CPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import NLIMB, FieldCtx

_NNIB = NLIMB * 4  # 64 nibbles per 256-bit element


# ------------------------------------------------------------ host helpers

def _matrix_nibble_planes(entries_mont: list[int], rows: int, cols: int) -> np.ndarray:
    """Row-major Montgomery ints -> (64, rows, cols) uint8 nibble planes
    (plane na holds nibble na of every entry) — the fixed operand of the
    exact bf16 matmuls."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in entries_mont)
    by = np.frombuffer(buf, dtype=np.uint8).reshape(rows * cols, 32)
    nib = np.empty((rows * cols, _NNIB), dtype=np.uint8)
    nib[:, 0::2] = by & 0xF
    nib[:, 1::2] = by >> 4
    return nib.reshape(rows, cols, _NNIB).transpose(2, 0, 1).copy()


@dataclass(frozen=True)
class MXUPlan:
    """Fixed tables for one (field, k, scales) MXU NTT.  The arrays are
    handed to the jitted kernel as ARGUMENTS (closure constants get
    re-shipped per call by some PJRT transports; plonk/kernels.py:1-7)."""

    ctx: FieldCtx
    k: int
    n1: int
    n2: int
    mu: int  # floor(2^270 / p): Barrett constant (fits u32)
    w1_planes: jnp.ndarray  # (64, n1, n1) uint8 Montgomery nibbles
    w2_planes: jnp.ndarray  # (64, n2, n2) uint8
    t_table: jnp.ndarray  # (n1, n2, 16) uint32 Montgomery limbs
    np_band: jnp.ndarray  # (32, 32) uint8 band of -p^-1 mod 2^256
    p_band: jnp.ndarray  # (32, 64) uint8 band of p
    p_limbs17: jnp.ndarray  # (17,) uint32 p limbs (top zero)

    @property
    def n(self) -> int:
        return self.n1 * self.n2

    @property
    def arrays(self) -> tuple:
        return (self.w1_planes, self.w2_planes, self.t_table,
                self.np_band, self.p_band, self.p_limbs17)


def make_plan(
    ctx: FieldCtx,
    k: int,
    omega: int,
    *,
    in_scale: int | None = None,
    out_mul: int | None = None,
    out_scale: int | None = None,
) -> MXUPlan:
    """Tables for y[i] = out_mul * out_scale^i * NTT_omega(in_scale^j * a_j)[i].

    in_scale:  coset evaluation (a_j *= zeta^j) — folds into W1 and T.
    out_mul:   uniform output factor (1/n for the inverse NTT) — into W2.
    out_scale: per-output-index factor (zeta^-i coset unscale) — into T
               (the i1 part) and W2 (the n1*i2 part).
    All folds are free: they rescale entries of matrices that already
    exist.  Reference behavior: halo2's best_fft / coset-FFT pair inside
    the quotient construction (reference benches/delay_enc.rs:121-133)."""
    f = ctx.field
    p = f.p
    n = 1 << k
    n1 = 1 << (k // 2)
    n2 = n // n1
    if max(n1, n2) > 1024:
        raise ValueError(f"mxu ntt supports n <= 2^20 (n1,n2 <= 1024); got k={k}")
    R = 1 << 256
    s_in = 1 if in_scale is None else int(in_scale) % p
    m_out = 1 if out_mul is None else int(out_mul) % p
    s_out = 1 if out_scale is None else int(out_scale) % p

    w1 = pow(omega, n2, p)  # order n1
    w2 = pow(omega, n1, p)  # order n2

    # W1[i1, j1] = w1^(i1*j1) * in_scale^(n2*j1)  (Montgomery)
    c1 = pow(s_in, n2, p)
    col1 = [pow(c1, j, p) * R % p for j in range(n1)]  # Montgomery column scale
    W1 = []
    for i1 in range(n1):
        base = pow(w1, i1, p)
        cur = 1
        row = []
        for j1 in range(n1):
            row.append(cur * col1[j1] % p)
            cur = cur * base % p
        W1.extend(row)

    # W2[i2, j2] = w2^(i2*j2) * out_mul * out_scale^(n1*i2)  (Montgomery)
    c2 = pow(s_out, n1, p)
    W2 = []
    for i2 in range(n2):
        base = pow(w2, i2, p)
        cur = pow(c2, i2, p) * m_out % p * R % p
        row = []
        for j2 in range(n2):
            row.append(cur)
            cur = cur * base % p
        W2.extend(row)

    # T[i1, j2] = omega^(i1*j2) * in_scale^j2 * out_scale^i1  (Montgomery)
    t_ints = []
    for i1 in range(n1):
        base = pow(omega, i1, p) * s_in % p
        cur = pow(s_out, i1, p) * R % p
        for _ in range(n2):
            t_ints.append(cur)
            cur = cur * base % p
    t_limbs = L.ints_to_limbs_np(t_ints).reshape(n1, n2, NLIMB)

    np_bytes = ((-pow(p, -1, R)) % R).to_bytes(32, "little")
    p_bytes = p.to_bytes(32, "little")
    np_band = np.zeros((32, 32), dtype=np.uint8)
    p_band = np.zeros((32, 64), dtype=np.uint8)
    for i in range(32):
        for c in range(i, 32):
            np_band[i, c] = np_bytes[c - i]
        for c in range(i, i + 32):
            p_band[i, c] = p_bytes[c - i]
    p17 = np.zeros(17, dtype=np.uint32)
    for i in range(16):
        p17[i] = (p >> (16 * i)) & 0xFFFF

    return MXUPlan(
        ctx=ctx, k=k, n1=n1, n2=n2, mu=(1 << 270) // p,
        w1_planes=jnp.asarray(_matrix_nibble_planes(W1, n1, n1)),
        w2_planes=jnp.asarray(_matrix_nibble_planes(W2, n2, n2)),
        t_table=jnp.asarray(t_limbs),
        np_band=jnp.asarray(np_band),
        p_band=jnp.asarray(p_band),
        p_limbs17=jnp.asarray(p17),
    )


# ------------------------------------------------------------ device kernel

def _to_nibbles(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) u32 limbs -> (..., 64) bf16 nibbles (values 0..15)."""
    shifts = jnp.asarray([0, 4, 8, 12], jnp.uint32)
    nib = (a[..., :, None] >> shifts) & jnp.uint32(0xF)
    return nib.reshape(*a.shape[:-1], _NNIB).astype(jnp.bfloat16)


def _planes_dot(planes: jnp.ndarray, data_nib: jnp.ndarray) -> jnp.ndarray:
    """out[i, b] = sum_j fixed[i, j] * data[j, b] in schoolbook nibble
    columns.  planes: (64, m, m) uint8; data_nib: (m, B, 64) bf16.
    Returns (m, B, 128) int32 nibble columns — exact: per-column sums are
    bounded by m * 64 * 15 * 15 <= 14.8M < 2^24 for m <= 1024."""
    m, B = data_nib.shape[0], data_nib.shape[1]
    dflat = data_nib.reshape(m, B * _NNIB)
    acc = jnp.zeros((m, B, 2 * _NNIB), jnp.float32)
    for na in range(_NNIB):
        part = jax.lax.dot(
            planes[na].astype(jnp.bfloat16), dflat,
            preferred_element_type=jnp.float32,
        ).reshape(m, B, _NNIB)
        acc = acc.at[..., na : na + _NNIB].add(part)
    return acc.astype(jnp.int32)


def _byte_cols_pack(cols: jnp.ndarray) -> jnp.ndarray:
    """(..., K) int32 byte columns -> (..., 2K) nibble columns (lossless)
    so the shared carry path below applies to byte-column tensors too."""
    return jnp.stack([cols & 0xF, cols >> 4], axis=-1).reshape(
        *cols.shape[:-1], 2 * cols.shape[-1])


def _nib_cols_to_bytes(cols: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """(..., K) int32 nibble columns (values < 2^24) -> (..., n_bytes)
    exact canonical byte columns (0..255).

    Nibble pairs combine to byte columns (< 2^29), one masked-carry pass
    bounds values < 2^22, byte pairs then combine into 16-bit columns
    (< 2^30, u32-safe) for ONE exact unrolled carry chain — sequential
    depth n_bytes/2 of cheap ALU.  The value must fit in n_bytes bytes
    (the final carry out is asserted zero by construction at call sites)."""
    assert n_bytes % 2 == 0
    nc = cols.shape[-1]
    even = cols[..., 0::2]
    odd = cols[..., 1::2]
    b = even + (odd << 4)  # byte columns, < 17 * 2^24 < 2^29
    pad = [(0, 0)] * (b.ndim - 1)
    b = jnp.pad(b, pad + [(0, n_bytes - (nc + 1) // 2)])
    lo = b & 0xFF
    hi = b >> 8  # < 2^21
    b = lo + jnp.pad(hi, pad + [(1, 0)])[..., :n_bytes]  # < 255 + 2^21
    w = b[..., 0::2] + (b[..., 1::2] << 8)  # 16-bit columns, < 2^30
    outs = []
    carry = w[..., 0] * 0
    for i in range(n_bytes // 2):
        v = w[..., i] + carry
        outs.append(v & 0xFFFF)
        carry = v >> 16
    w = jnp.stack(outs, axis=-1)
    return jnp.stack([w & 0xFF, w >> 8], axis=-1).reshape(
        *w.shape[:-1], n_bytes)


def _band_dot(bytes_in: jnp.ndarray, band: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) canonical byte cols x (32, C) byte band -> (..., C) i32
    schoolbook byte columns; sums < 32 * 255^2 < 2^24, bf16/f32-exact."""
    lead = bytes_in.shape[:-1]
    out = jax.lax.dot(
        bytes_in.reshape(-1, 32).astype(jnp.bfloat16),
        band.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int32).reshape(*lead, band.shape[-1])


def _bytes_to_limbs(by: jnp.ndarray) -> jnp.ndarray:
    """(..., 2L) canonical byte cols -> (..., L) u32 16-bit limbs."""
    return (by[..., 0::2] + (by[..., 1::2] << 8)).astype(jnp.uint32)


def _redc_barrett(ctx: FieldCtx, np_band, p_band, p17, mu: int,
                  cols: jnp.ndarray) -> jnp.ndarray:
    """(..., 128) int32 nibble columns of V < 2^518 (one matmul pass's raw
    schoolbook output) -> (..., 16) u32 canonical limbs of V*2^-256 mod p."""
    v_bytes = _nib_cols_to_bytes(cols, 68).astype(jnp.int32)
    # m = (V mod R) * (-p^-1) mod R — only the low 32 product byte columns
    # (np_band is upper-triangular: higher columns never feed back down)
    m_cols = _band_dot(v_bytes[..., :32], np_band)
    m_bytes = _nib_cols_to_bytes(_byte_cols_pack(m_cols), 34)[..., :32]
    # V + m*p: low 256 bits cancel exactly; >> 256 is a byte-column slice
    mp_cols = _band_dot(m_bytes, p_band)  # (..., 64)
    pad = [(0, 0)] * (mp_cols.ndim - 1)
    tot = v_bytes + jnp.pad(mp_cols, pad + [(0, 4)])
    tot_bytes = _nib_cols_to_bytes(_byte_cols_pack(tot), 70)
    x = _bytes_to_limbs(tot_bytes[..., 32:66])  # (..., 17) limbs, X < 2^262
    # Barrett tail: q = (floor(X/2^250) * mu) >> 20  =>  X - q*p < 3p
    t_top = (x[..., 15] >> 10) | (x[..., 16] << 6)  # < 2^12
    q = (t_top * jnp.uint32(mu)) >> 20  # <= X/p < 2^9
    qp = q[..., None] * p17  # (..., 17) < 2^25
    carry = qp[..., 0] * 0
    qp_limbs = []
    for i in range(17):
        v = qp[..., i] + carry
        qp_limbs.append(v & 0xFFFF)
        carry = v >> 16
    borrow = carry * 0
    outs = []
    for i in range(17):
        d = x[..., i] - qp_limbs[i] - borrow
        borrow = (d >> 31) & 1
        outs.append(d & 0xFFFF)
    r = jnp.stack(outs[:16], axis=-1)  # < 3p: top limb cancels to zero
    r = L._sub_p_if_ge(ctx, r)
    return L._sub_p_if_ge(ctx, r)


def ntt_mxu_raw(w1_planes, w2_planes, t_table, np_band, p_band, p17,
                a, *, mu: int, n1: int, n2: int) -> jnp.ndarray:
    """Traceable core: (n, 16) u32 Montgomery rows -> natural-order NTT."""
    ctx = L.FR_CTX
    A = a.reshape(n1, n2, NLIMB)
    # step 1 (MXU): B[i1, j2] = sum_j1 W1[i1,j1] * A[j1,j2]
    cols1 = _planes_dot(w1_planes, _to_nibbles(A))
    B = _redc_barrett(ctx, np_band, p_band, p17, mu, cols1)
    # step 2 (VPU): C = B * T elementwise — the only per-element mont_mul
    C = L.mont_mul(ctx, B, t_table)
    # step 3 (MXU): Y[i2, i1] = sum_j2 W2[i2,j2] * C[i1,j2]
    c_t = jnp.transpose(_to_nibbles(C), (1, 0, 2))  # (n2, n1, 64)
    cols3 = _planes_dot(w2_planes, c_t)
    Y = _redc_barrett(ctx, np_band, p_band, p17, mu, cols3)
    # Y[i2, i1] with i = i1 + n1*i2 IS natural order once flattened
    return Y.reshape(n1 * n2, NLIMB)


@lru_cache(maxsize=None)
def _jit_single(mu: int, n1: int, n2: int):
    return jax.jit(partial(ntt_mxu_raw, mu=mu, n1=n1, n2=n2))


@lru_cache(maxsize=None)
def _jit_stack(mu: int, n1: int, n2: int):
    """Batched transform over a (S, n, 16) stack.  Sequential `lax.map`
    (NOT vmap): one poly's matmul pipeline holds ~0.3 GB of f32 column
    intermediates at n = 2^19 — vmapping a 19-poly stack would hold all
    lanes' intermediates live at once and OOM a 16 GB chip, while the
    per-poly MXU launches are already large enough to saturate the core."""
    fn = partial(ntt_mxu_raw, mu=mu, n1=n1, n2=n2)

    def run(w1, w2, t, npb, pb, p17, stack):
        return jax.lax.map(
            lambda a: fn(w1, w2, t, npb, pb, p17, a), stack)

    return jax.jit(run)


def ntt_mxu(plan: MXUPlan, a: jnp.ndarray) -> jnp.ndarray:
    """Natural-order NTT of (n, 16) u32 Montgomery rows — bit-exact vs.
    ops/ntt.stockham with the plan's scales folded in."""
    return _jit_single(plan.mu, plan.n1, plan.n2)(*plan.arrays, a)


def ntt_mxu_stack(plan: MXUPlan, stack: jnp.ndarray) -> jnp.ndarray:
    """(S, n, 16) stack -> (S, n, 16), one sequential device launch."""
    return _jit_stack(plan.mu, plan.n1, plan.n2)(*plan.arrays, stack)
