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


def _complete_add_impl(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Branchless complete addition on y^2 = x^3 + 3 (b3 = 9).
    Renes-Costello-Batina Algorithm 7; p, q: (..., 3, 16) Montgomery.

    The 12 field multiplies are packed into two *batched* mont_mul calls
    (6 products each, stacked on a fresh leading axis): the XLA graph is
    ~6x smaller and the VPU sees 6x wider vectors."""
    ctx = FQ_CTX
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    add = lambda a, b: L.add(ctx, a, b)
    sub = lambda a, b: L.sub(ctx, a, b)

    # pre-adds, batched: [X1+Y1, Y1+Z1, X1+Z1, X2+Y2, Y2+Z2, X2+Z2]
    s = add(jnp.stack([X1, Y1, X1, X2, Y2, X2]), jnp.stack([Y1, Z1, Z1, Y2, Z2, Z2]))
    # round 1: t0=X1X2, t1=Y1Y2, t2=Z1Z2, m3.., m4.., m5..
    r1 = L.mont_mul(
        ctx,
        jnp.stack([X1, Y1, Z1, s[0], s[1], s[2]]),
        jnp.stack([X2, Y2, Z2, s[3], s[4], s[5]]),
    )
    t0, t1, t2, m3, m4, m5 = (r1[i] for i in range(6))

    pair = add(jnp.stack([t0, t1, t0]), jnp.stack([t1, t2, t2]))
    d3 = sub(jnp.stack([m3, m4, m5]), pair)  # [t3, t4, Y3pre]
    t3, t4, y3p = d3[0], d3[1], d3[2]
    # triples: [3*t2, 3*Y3pre, 3*t0] then [9*t2, 9*Y3pre]
    tri_in = jnp.stack([t2, y3p, t0])
    tri = add(add(tri_in, tri_in), tri_in)
    nine_in = tri[:2]
    nine = add(add(nine_in, nine_in), nine_in)
    t2_9, Y3 = nine[0], nine[1]
    t0 = tri[2]
    Z3 = add(t1, t2_9)
    t1 = sub(t1, t2_9)

    # round 2: [t4*Y3, t3*t1, Y3*t0, t1*Z3, t0*t3, Z3*t4]
    r2 = L.mont_mul(
        ctx, jnp.stack([t4, t3, Y3, t1, t0, Z3]), jnp.stack([Y3, t1, t0, Z3, t3, t4])
    )
    X3 = sub(r2[1], r2[0])
    fin = add(jnp.stack([r2[3], r2[5]]), jnp.stack([r2[2], r2[4]]))
    return jnp.stack([X3, fin[0], fin[1]], axis=-2)


def _pallas_eligible(shape) -> bool:
    # Experimental: the fused Pallas path is gated off by default — the
    # sandbox's PJRT remote-compile helper currently crashes on Mosaic
    # programs of this size (see ops/field_pallas.py).  Enable with
    # DELAY_ENC_USE_PALLAS=1 on stacks with a healthy compiler service.
    import os

    if os.environ.get("DELAY_ENC_USE_PALLAS") != "1":
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    n = 1
    for d in shape[:-2]:
        n *= int(d)
    return n >= 512


def complete_add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete addition; large batches on TPU run as a fused Pallas kernel
    (the whole 12-mul formula in VMEM: one launch, no giant HBM
    intermediates), small/CPU batches use the plain jnp implementation."""
    if _pallas_eligible(jnp.broadcast_shapes(p.shape, q.shape)):
        from .field_pallas import complete_add_pallas

        return complete_add_pallas(p, q)
    return _complete_add_impl(p, q)


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

_TREE_UNROLL_MIN = 128


def _tree_reduce(x: jnp.ndarray) -> jnp.ndarray:
    """Reduce (…, M, 3, 16) along axis -3 with complete adds (M power of 2).

    The top levels (the bulk of the work) are unrolled; the tail runs as a
    fixed-shape fori_loop that halves the logical length while padding with
    identities — the traced graph size stays bounded regardless of M (large
    unrolled graphs can exceed PJRT compile-service program limits)."""
    while x.shape[-3] > _TREE_UNROLL_MIN:
        x = complete_add(x[..., 0::2, :, :], x[..., 1::2, :, :])
    m = x.shape[-3]
    if m == 1:
        return x[..., 0, :, :]
    levels = m.bit_length() - 1
    ident = jnp.broadcast_to(identity_proj(), x[..., : m // 2, :, :].shape)

    def body(_, v):
        s = complete_add(v[..., 0::2, :, :], v[..., 1::2, :, :])  # (…, m/2, 3, 16)
        return jnp.concatenate([s, ident], axis=-3)

    x = jax.lax.fori_loop(0, levels, body, x)
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

    # per-plane chunked select + tree reduce; lax.map so the chunk body is
    # traced/compiled once regardless of the number of chunks
    quad_idx = jnp.arange(quads)
    n_chunks = (SCALAR_BITS + plane_chunk - 1) // plane_chunk
    pad_planes = n_chunks * plane_chunk - SCALAR_BITS
    sel_padded = jnp.concatenate(
        [sel, jnp.zeros((pad_planes, quads), sel.dtype)], axis=0
    ).reshape(n_chunks, plane_chunk, quads)

    def chunk_body(s):
        selected = combos[quad_idx[None, :], s]  # (C, quads, 3, 16)
        return _tree_reduce(selected)  # (C, 3, 16)

    plane_sums = jax.lax.map(chunk_body, sel_padded).reshape(
        n_chunks * plane_chunk, 3, L.NLIMB
    )[:SCALAR_BITS]

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
