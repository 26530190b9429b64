"""Multi-scalar multiplication on TPU (G1 over Fq limb tensors).

TPU-native replacement for `halo2_proofs`' CPU Pippenger (driven inside
create_proof / ParamsKZG commitments, reference benches/delay_enc.rs:123).

Why not Pippenger: bucket accumulation is scatter-heavy (sorts + segmented
reductions), which maps poorly to the TPU's regular vector model.  Instead we
use a *bit-plane masked-tree* formulation, which is scatter-free and fully
regular:

    MSM = sum_b 2^b * S_b,   S_b = sum_{i : bit b of s_i} P_i

 * All 254 bit-plane sums share the same points, so the first two tree
   levels are precomputed once: pair sums (4 options per pair) and quad
   combo tables (16 options per quad).  Each plane then just *selects* its
   quad option by a 4-bit index and tree-reduces with complete additions.
   Work: ~N/2 + 2.25N shared adds + 254*(N/4) plane adds — ~4x cheaper than
   the naive 254*N masked tree and with no data-dependent control flow.
 * Point addition is the branchless complete formula for a=0 short
   Weierstrass curves (Renes-Costello-Batina 2016, Algorithm 7), valid for
   all inputs (identity, doubling) on prime-order G1 — no selects in the
   hot loop.
 * Plane chunking bounds peak memory (chunk * N/4 * 192B).

The multi-chip sharded variant lives in `delay_enc_tpu.parallel.msm`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.bn254 import G1
from . import limbs as L
from .limbs import FQ_CTX, FieldCtx

SCALAR_BITS = 254


# ----------------------------------------------------------- point helpers

def identity_proj() -> jnp.ndarray:
    """(3,16) projective identity (0 : 1 : 0) in Montgomery form."""
    return jnp.stack([FQ_CTX.zero, FQ_CTX.one_mont(), FQ_CTX.zero])


def points_to_device(points) -> jnp.ndarray:
    """Host affine points [(x,y) | None] -> (N,3,16) projective Montgomery."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    x = FQ_CTX.to_mont_np(xs)
    y = FQ_CTX.to_mont_np(ys)
    z = FQ_CTX.to_mont_np(zs)
    return jnp.asarray(np.stack([x, y, z], axis=1))


def points_from_device(pts) -> list:
    """(N,3,16) projective Montgomery -> host affine [(x,y) | None]."""
    pts = np.asarray(jax.device_get(pts)).reshape(-1, 3, L.NLIMB)
    xs = FQ_CTX.from_mont_np(pts[:, 0])
    ys = FQ_CTX.from_mont_np(pts[:, 1])
    zs = FQ_CTX.from_mont_np(pts[:, 2])
    p = FQ_CTX.field.p
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, p)
            out.append((x * zi % p, y * zi % p))
    return out


def _mul3(ctx: FieldCtx, x: jnp.ndarray) -> jnp.ndarray:
    return L.add(ctx, L.add(ctx, x, x), x)


def complete_add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Branchless complete addition on y^2 = x^3 + 3 (b3 = 9).
    Renes-Costello-Batina Algorithm 7; p, q: (..., 3, 16) Montgomery."""
    ctx = FQ_CTX
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    mul, add, sub = (
        lambda a, b: L.mont_mul(ctx, a, b),
        lambda a, b: L.add(ctx, a, b),
        lambda a, b: L.sub(ctx, a, b),
    )

    def b3(x):  # 9x = 3*(3x)
        return _mul3(ctx, _mul3(ctx, x))

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = b3(t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = b3(Y3)
    X3 = mul(t4, Y3)
    t2 = mul(t3, t1)
    X3 = sub(t2, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return jnp.stack([X3, Y3, Z3], axis=-2)


def point_double(p: jnp.ndarray) -> jnp.ndarray:
    return complete_add(p, p)


def point_neg(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([p[..., 0, :], L.neg(FQ_CTX, p[..., 1, :]), p[..., 2, :]], axis=-2)


def point_select(cond, a, b):
    """cond ? a : b with cond shaped like the batch (no point/limb axes)."""
    return jnp.where(cond[..., None, None], a, b)


# ------------------------------------------------------------ scalar planes

def scalar_bits_from_limbs(scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """(N,16) canonical limbs -> (254, N) uint32 bit planes (LSB first)."""
    n = scalar_limbs.shape[0]
    shifts = jnp.arange(L.LIMB_BITS, dtype=jnp.uint32)[None, None, :]
    bits = (scalar_limbs[:, :, None] >> shifts) & 1  # (N, limb, bitpos)
    return bits.reshape(n, 256).T[:SCALAR_BITS]


def scalars_to_limbs(scalars) -> jnp.ndarray:
    """Host ints -> (N,16) canonical limb array."""
    return jnp.asarray(L.ints_to_limbs_np([int(s) for s in scalars]))


# ------------------------------------------------------------------- MSM

def _tree_reduce(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce (…, M, 3, 16) along axis -3 with complete adds (M power of 2)."""
    while x.shape[-3] > 1:
        x = complete_add(x[..., 0::2, :, :], x[..., 1::2, :, :])
    return x[..., 0, :, :]


def msm(points: jnp.ndarray, scalar_limbs: jnp.ndarray, plane_chunk: int = 64) -> jnp.ndarray:
    """points (N,3,16) proj Montgomery, scalar_limbs (N,16) canonical.
    Returns the (3,16) projective Montgomery MSM result."""
    n = points.shape[0]
    # pad to a power of two, at least 4
    n_pad = max(4, 1 << (n - 1).bit_length())
    if n_pad != n:
        pad_pts = jnp.broadcast_to(identity_proj(), (n_pad - n, 3, L.NLIMB))
        points = jnp.concatenate([points, pad_pts], axis=0)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((n_pad - n, L.NLIMB), jnp.uint32)], axis=0
        )
    bits = scalar_bits_from_limbs(scalar_limbs)  # (254, n_pad)

    # shared level 0: pair options [inf, P_even, P_odd, P_even+P_odd]
    p_even, p_odd = points[0::2], points[1::2]
    p_sum = complete_add(p_even, p_odd)
    inf = jnp.broadcast_to(identity_proj(), p_even.shape)
    pair_opts = jnp.stack([inf, p_even, p_odd, p_sum], axis=1)  # (n/2, 4, 3, 16)

    # shared level 1: quad combos[selA + 4*selB]
    opts_a, opts_b = pair_opts[0::2], pair_opts[1::2]  # (n/4, 4, 3, 16)
    combos = [None] * 16
    for i in range(4):
        combos[i] = opts_a[:, i]  # selB = 0 -> identity from B
    for j in range(1, 4):
        combos[4 * j] = opts_b[:, j]  # selA = 0
    nontrivial = [(i, j) for i in range(1, 4) for j in range(1, 4)]
    added = complete_add(
        jnp.concatenate([opts_a[:, i] for i, _ in nontrivial], axis=0),
        jnp.concatenate([opts_b[:, j] for _, j in nontrivial], axis=0),
    )
    quads = opts_a.shape[0]
    for k, (i, j) in enumerate(nontrivial):
        combos[i + 4 * j] = added[k * quads : (k + 1) * quads]
    combos = jnp.stack(combos, axis=1)  # (n/4, 16, 3, 16)

    # 4-bit selector per quad per plane
    b = bits.reshape(SCALAR_BITS, quads, 4)
    sel = b[..., 0] + 2 * b[..., 1] + 4 * b[..., 2] + 8 * b[..., 3]  # (254, n/4)

    # per-plane chunked select + tree reduce
    plane_sums = []
    quad_idx = jnp.arange(quads)
    for start in range(0, SCALAR_BITS, plane_chunk):
        s = sel[start : start + plane_chunk]  # (C, quads)
        selected = combos[quad_idx[None, :], s]  # (C, quads, 3, 16)
        plane_sums.append(_tree_reduce(selected))  # (C, 3, 16)
    plane_sums = jnp.concatenate(plane_sums, axis=0)  # (254, 3, 16)

    # Horner combine from the MSB plane
    def step(acc, s_b):
        return complete_add(point_double(acc), s_b), None

    acc, _ = jax.lax.scan(step, plane_sums[SCALAR_BITS - 1], plane_sums[:-1], reverse=True)
    return acc


# --------------------------------------------- fixed-base batch scalar mul

def base_table(point) -> jnp.ndarray:
    """(254,3,16) device table of 2^b * P (host doubling chain)."""
    pts = []
    cur = point
    for _ in range(SCALAR_BITS):
        pts.append(cur)
        cur = G1.double(cur)
    return points_to_device(pts)


def fixed_base_batch_mul(table: jnp.ndarray, scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """[s_i * P] for many scalars: scan over bit planes of the shared base
    table.  Used to build the SRS powers on device."""
    bits = scalar_bits_from_limbs(scalar_limbs)  # (254, N)
    n = scalar_limbs.shape[0]
    init = jnp.broadcast_to(identity_proj(), (n, 3, L.NLIMB))

    def step(acc, inputs):
        bit, tab = inputs
        contrib = point_select(bit.astype(bool), jnp.broadcast_to(tab, acc.shape),
                               jnp.broadcast_to(identity_proj(), acc.shape))
        return complete_add(acc, contrib), None

    acc, _ = jax.lax.scan(step, init, (bits, table))
    return acc
