"""Multi-scalar multiplication on TPU (G1 over Fq limb tensors).

TPU-native replacement for `halo2_proofs`' CPU Pippenger (driven inside
create_proof / ParamsKZG commitments, reference benches/delay_enc.rs:123).

Why not Pippenger: bucket accumulation is scatter/gather-heavy, and on TPU
random gathers run ~50x below HBM bandwidth.  This design (v2, rebuilt from
device profiling) is fully gather-free and batches every step:

 1. **Pair tables, built once per point set** (they depend only on the SRS
    points, so all ~30 commitments of a proof — and every later proof —
    share them): for each adjacent pair (P_even, P_odd), the three nonzero
    subset sums [P_even, P_odd, P_even+P_odd] as (n/2, 3, 16) tensors.
 2. **Bit-plane sums via elementwise 4-way select**: for scalar bit-plane b,
    each pair contributes table[2*bit_even + bit_odd], selected with
    branchless `where` chains (XLA fuses them into the addition tree — no
    gather, reads run at full memory bandwidth), then a contiguous-halves
    tree reduction with branchless complete additions
    (Renes-Costello-Batina 2016 Alg 7) yields S_b = sum_{bit b set} P_i.
    Planes are processed in chunks under `lax.map`, batched across
    commitments.
 3. **Host Horner combine**: MSM = sum_b 2^b S_b needs a 253-deep sequential
    double chain — a handful of microseconds per step in host bignum
    arithmetic but ~1ms per step as batch-1 device dispatches, so the 254
    plane sums come back to the host (12KB) and fold in Jacobian
    coordinates there.

The multi-chip sharded variant lives in `delay_enc_tpu.parallel.msm`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.bn254 import G1
from ..fields.bn254 import FQ
from . import limbs as L
from .limbs import FQ_CTX, FieldCtx

SCALAR_BITS = 254
# base-4 digit planes: scalar = sum_p 4^p d_p, d_p in {0..3}; halves the
# per-commitment addition count vs bit planes (127 tree reductions, not 254)
PLANES = 127
P = FQ.p


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
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, P)
            out.append((x * zi % P, y * zi % P))
    return out


def _pt_unpack(p):
    """(…, 3, 16) -> (X, Y, Z) limb-row lists."""
    return (L.unpack(p[..., 0, :]), L.unpack(p[..., 1, :]), L.unpack(p[..., 2, :]))


def _pt_pack(t) -> jnp.ndarray:
    return jnp.stack([L.pack(t[0]), L.pack(t[1]), L.pack(t[2])], axis=-2)


def _ll_mont_mul_many(ctx, pairs):
    """Batch k independent limb-row products into ONE ll_mont_mul by
    concatenating along a fresh leading axis: the Montgomery chain is the
    dominant op count (~1.3K HLO ops), so 6 muls cost one chain instead of
    six — the traced graph (and XLA compile time) shrinks ~5x per
    complete addition."""
    shape = jnp.broadcast_shapes(*(r.shape for p in pairs for side in p for r in side))
    k = len(pairs)

    def cat(side):
        return [
            jnp.concatenate(
                [jnp.broadcast_to(p[side][i], shape) for p in pairs], axis=0
            )
            for i in range(L.NLIMB)
        ]

    out = L.ll_mont_mul(ctx, cat(0), cat(1))
    step = shape[0]
    return [
        [r[j * step : (j + 1) * step] for r in out] for j in range(k)
    ]


def _u32rows(rows):
    return [r.astype(jnp.uint32) for r in rows]


def _u16rows(rows):
    """Canonical limb rows are < 2^16: storing materialized intermediates as
    uint16 halves the HBM traffic between fused kernels."""
    return [r.astype(jnp.uint16) for r in rows]


def _ll_complete_add(A, B):
    """Branchless complete addition on y^2 = x^3 + 3 (b3 = 9) in limb-row
    form (Renes-Costello-Batina 2016, Algorithm 7).  Pure elementwise ops
    with the two 6-product rounds batched into single Montgomery chains."""
    ctx = FQ_CTX
    X1, Y1, Z1 = _u32rows(A[0]), _u32rows(A[1]), _u32rows(A[2])
    X2, Y2, Z2 = _u32rows(B[0]), _u32rows(B[1]), _u32rows(B[2])
    A = (X1, Y1, Z1)
    B = (X2, Y2, Z2)
    add = lambda a, b: L.ll_add(ctx, a, b)
    sub = lambda a, b: L.ll_sub(ctx, a, b)

    t0, t1, t2, m3, m4, m5 = _ll_mont_mul_many(ctx, [
        (X1, X2), (Y1, Y2), (Z1, Z2),
        (add(X1, Y1), add(X2, Y2)),
        (add(Y1, Z1), add(Y2, Z2)),
        (add(X1, Z1), add(X2, Z2)),
    ])
    t3 = sub(m3, add(t0, t1))
    t4 = sub(m4, add(t1, t2))
    y3p = sub(m5, add(t0, t2))
    t2_3 = add(add(t2, t2), t2)
    t2_9 = add(add(t2_3, t2_3), t2_3)
    y3p3 = add(add(y3p, y3p), y3p)
    Y3 = add(add(y3p3, y3p3), y3p3)  # 9 * (X1Z2 + X2Z1)
    t0 = add(add(t0, t0), t0)  # 3 * t0
    Z3 = add(t1, t2_9)
    t1 = sub(t1, t2_9)
    r0, r1b, r2b, r3b, r4b, r5b = _ll_mont_mul_many(ctx, [
        (t3, t1), (t4, Y3), (t1, Z3), (Y3, t0), (Z3, t4), (t0, t3),
    ])
    X3 = sub(r0, r1b)
    Y3_out = add(r2b, r3b)
    Z3_out = add(r4b, r5b)
    return (X3, Y3_out, Z3_out)


def _complete_add_array(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Array-level complete addition (the 12 multiplies packed into two
    6-wide batched mont_mul calls).  Used on CPU, where the array ops lower
    to compact lax.scan graphs that compile in seconds — the limb-row form
    is a ~16K-op graph per addition and XLA:CPU takes minutes on it."""
    ctx = FQ_CTX
    p = p.astype(jnp.uint32)  # u16-stored plane sums re-enter here
    q = q.astype(jnp.uint32)
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    add = lambda a, b: L.add(ctx, a, b)
    sub = lambda a, b: L.sub(ctx, a, b)

    s = add(jnp.stack([X1, Y1, X1, X2, Y2, X2]), jnp.stack([Y1, Z1, Z1, Y2, Z2, Z2]))
    r1 = L.mont_mul(
        ctx,
        jnp.stack([X1, Y1, Z1, s[0], s[1], s[2]]),
        jnp.stack([X2, Y2, Z2, s[3], s[4], s[5]]),
    )
    t0, t1, t2, m3, m4, m5 = (r1[i] for i in range(6))
    pair = add(jnp.stack([t0, t1, t0]), jnp.stack([t1, t2, t2]))
    d3 = sub(jnp.stack([m3, m4, m5]), pair)
    t3, t4, y3p = d3[0], d3[1], d3[2]
    tri_in = jnp.stack([t2, y3p, t0])
    tri = add(add(tri_in, tri_in), tri_in)
    nine_in = tri[:2]
    nine = add(add(nine_in, nine_in), nine_in)
    t2_9, Y3 = nine[0], nine[1]
    t0 = tri[2]
    Z3 = add(t1, t2_9)
    t1 = sub(t1, t2_9)
    r2 = L.mont_mul(
        ctx, jnp.stack([t4, t3, Y3, t1, t0, Z3]), jnp.stack([Y3, t1, t0, Z3, t3, t4])
    )
    X3 = sub(r2[1], r2[0])
    fin = add(jnp.stack([r2[3], r2[5]]), jnp.stack([r2[2], r2[4]]))
    return jnp.stack([X3, fin[0], fin[1]], axis=-2)


def _complete_add_impl(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    p = jnp.broadcast_to(p, shape)
    q = jnp.broadcast_to(q, shape)
    if not L._backend_unrolls():
        return _complete_add_array(p, q)
    if p.ndim == 2:  # single (3,16) point: the limb rows need a batch axis
        return _complete_add_impl(p[None], q[None])[0]
    return _pt_pack(_ll_complete_add(_pt_unpack(p), _pt_unpack(q)))


def complete_add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
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
    """(..., N, 16) canonical limbs -> (..., 254, N) uint32 bit planes
    (LSB-first)."""
    *lead, n, _ = scalar_limbs.shape
    shifts = jnp.arange(L.LIMB_BITS, dtype=jnp.uint32)
    bits = (scalar_limbs[..., None] >> shifts) & 1  # (..., N, limb, bitpos)
    bits = bits.reshape(*lead, n, 256)
    return jnp.moveaxis(bits, -1, -2)[..., :SCALAR_BITS, :]


def scalars_to_limbs(scalars) -> jnp.ndarray:
    """Host ints -> (N,16) canonical limb array."""
    return jnp.asarray(L.ints_to_limbs_np([int(s) for s in scalars]))


# ------------------------------------------------------------------- MSM

def _pad_pow2(points: jnp.ndarray, scalar_limbs: jnp.ndarray):
    n = points.shape[0]
    n_pad = max(2, 1 << (n - 1).bit_length())
    if n_pad != n:
        pad_pts = jnp.broadcast_to(identity_proj(), (n_pad - n, 3, L.NLIMB))
        points = jnp.concatenate([points, pad_pts], axis=0)
        pad_axes = scalar_limbs.shape[:-2]
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((*pad_axes, n_pad - n, L.NLIMB), jnp.uint32)],
            axis=-2,
        )
    return points, scalar_limbs


@jax.jit
def _jit_pair_tables(points: jnp.ndarray):
    """(n,3,16) projective Montgomery -> (16, n/2, 3, 16) base-4 pair
    tables: option[ce + 4*co] = ce*P_even + co*P_odd for ce, co in 0..3.
    Depends only on the points: built once per SRS, shared by every
    commitment of every proof."""
    pe, po = points[0::2], points[1::2]
    inf = jnp.broadcast_to(identity_proj(), pe.shape)
    pe2 = complete_add(pe, pe)
    po2 = complete_add(po, po)
    pe3 = complete_add(pe2, pe)
    po3 = complete_add(po2, po)
    e_opts = [inf, pe, pe2, pe3]
    o_opts = [inf, po, po2, po3]
    opts = [None] * 16
    for ce in range(4):
        opts[ce] = e_opts[ce]
    for co in range(1, 4):
        opts[4 * co] = o_opts[co]
    # 9 cross sums in one batched add
    cross = complete_add(
        jnp.concatenate([e_opts[ce] for ce in (1, 2, 3) for _ in (1, 2, 3)], axis=0),
        jnp.concatenate([o_opts[co] for _ in (1, 2, 3) for co in (1, 2, 3)], axis=0),
    )
    m = pe.shape[0]
    idx = 0
    for ce in (1, 2, 3):
        for co in (1, 2, 3):
            opts[ce + 4 * co] = cross[idx * m : (idx + 1) * m]
            idx += 1
    # canonical limbs are < 2^16: uint16 storage halves table read traffic
    return jnp.stack(opts, axis=0).astype(jnp.uint16)  # (16, n/2, 3, 16)


def _ll_select16(opts_ll, sel):
    """sel (…, n/2) in {0..15} -> (X, Y, Z) limb rows selecting from the 16
    base-4 pair options.  Elementwise where-chains — no gather."""
    one_rows = [int(v) for v in L.int_to_limbs_np((1 << 256) % P)]
    out = []
    for coord in range(3):
        rows = []
        for i in range(L.NLIMB):
            inf_i = jnp.uint16(one_rows[i]) if coord == 1 else jnp.uint16(0)
            x = inf_i
            for o in range(1, 16):
                x = jnp.where(sel == o, opts_ll[o][coord][i], x)
            rows.append(x)
        out.append(rows)
    return tuple(out)


# planes per _jit_plane_sums launch: more planes per chunk amortize the
# per-launch overhead of the tunnel transport across fewer lax.map steps
# at the cost of proportionally larger level-0 intermediates (~25 MB per
# plane at n=2^16).  Env-tunable for TPU experiments; changing it changes
# the compiled shapes (fresh compile).
import os as _os

PLANE_CHUNK = int(_os.environ.get("DELAY_ENC_PLANE_CHUNK", "16"))


@jax.jit
def _jit_plane_sums(opts, sel_chunks):
    """opts (16, n/2, 3, 16); sel_chunks (nc, C, n/2) uint8 ->
    (nc, C, 3, 16) per-plane sums.  On TPU the select + full binary
    addition tree runs in limb-row form — one pure elementwise DAG per
    chunk, packed to (C, 3, 16) at the end; on CPU a compact array/scan
    form compiles in seconds instead."""
    if not L._backend_unrolls():
        inf = identity_proj()

        def chunk_array(s):
            sel = s[..., None, None]
            x = jnp.broadcast_to(inf, s.shape + (3, L.NLIMB))
            for o in range(1, 16):
                x = jnp.where(sel == o, opts[o].astype(jnp.uint32), x)
            while x.shape[1] > 1:
                h = x.shape[1] // 2
                x = _complete_add_array(x[:, :h], x[:, h:])
            return x[:, 0]

        return jax.lax.map(chunk_array, sel_chunks)

    opts_ll = [_pt_unpack(opts[o]) for o in range(16)]

    TAIL_W = 64

    def chunk(s):
        x = _ll_select16(opts_ll, s)  # rows (C, n/2), uint16
        width = s.shape[-1]
        # unroll the wide levels (they carry ~99% of the additions) ...
        while width > TAIL_W:
            h = width // 2
            lo = tuple([r[..., :h] for r in coord] for coord in x)
            hi = tuple([r[..., h:] for r in coord] for coord in x)
            x = _ll_complete_add(lo, hi)
            x = tuple(_u16rows(coord) for coord in x)  # halve stored bytes
            width = h
        # ... then fold the narrow tail under ONE compiled fori body: pair
        # adjacent lanes (prefix-compact), pad with identity — compile cost
        # of log2(TAIL_W) more unrolled levels collapses to a single level
        if width > 1:
            one_rows = [int(v) for v in L.int_to_limbs_np((1 << 256) % P)]

            def fold(_, rows):
                lo = tuple([r[..., 0::2] for r in coord] for coord in rows)
                hi = tuple([r[..., 1::2] for r in coord] for coord in rows)
                summed = _ll_complete_add(lo, hi)
                out = []
                for c, coord in enumerate(summed):
                    pad_rows = []
                    for i, r in enumerate(coord):
                        fill = one_rows[i] if c == 1 else 0
                        pad = jnp.full(r.shape, fill, jnp.uint16)
                        pad_rows.append(
                            jnp.concatenate([r.astype(jnp.uint16), pad], axis=-1)
                        )
                    out.append(pad_rows)
                return tuple(out)

            x = jax.lax.fori_loop(0, width.bit_length() - 1, fold, x)
        return _pt_pack(tuple([r[..., 0] for r in coord] for coord in x))

    return jax.lax.map(chunk, sel_chunks)


@jax.jit
def _jit_pair_sel(scalar_limbs):
    """(..., n, 16) canonical -> (..., 127, n/2) uint8 base-4 pair
    selectors (digit_even + 4*digit_odd per plane)."""
    bits = scalar_bits_from_limbs(scalar_limbs)  # (..., 254, n)
    *lead, nb, n = bits.shape
    d = bits.reshape(*lead, PLANES, 2, n)
    d4 = d[..., 0, :] + 2 * d[..., 1, :]  # (..., 127, n) digit per point
    pairs = d4.reshape(*lead, PLANES, n // 2, 2)
    return (pairs[..., 0] + 4 * pairs[..., 1]).astype(jnp.uint8)


def plane_sums_batch(tables, scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """tables from `_jit_pair_tables`; scalar_limbs (B, n, 16) canonical.
    Returns (B, 127, 3, 16) base-4 plane sums (device)."""
    sel = _jit_pair_sel(scalar_limbs)  # (B, 127, n/2)
    b = sel.shape[0]
    flat = sel.reshape(b * PLANES, -1)
    nc = (flat.shape[0] + PLANE_CHUNK - 1) // PLANE_CHUNK
    pad = nc * PLANE_CHUNK - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, flat.shape[1]), flat.dtype)], axis=0)
    sums = _jit_plane_sums(tables, flat.reshape(nc, PLANE_CHUNK, -1))
    return sums.reshape(nc * PLANE_CHUNK, 3, L.NLIMB)[: b * PLANES].reshape(
        b, PLANES, 3, L.NLIMB
    )


# ---- host-side Horner combine (Jacobian; ~us per step vs ~ms on device) --

from ..curves.bn254 import _jac_add_affine, _jac_double, _jac_to_affine


def horner_host(plane_pts_affine) -> "tuple | None":
    """plane_pts_affine: LSB-first list of 127 base-4 plane sums (affine or
    None).  Returns the affine MSM result sum_p 4^p S_p."""
    acc = None
    for pt in reversed(plane_pts_affine):
        acc = _jac_double(_jac_double(acc))
        acc = _jac_add_affine(acc, pt)
    return _jac_to_affine(acc)


def proj_batch_to_affine_host(pts_dev) -> list:
    """(M,3,16) projective Montgomery -> [affine | None], with one shared
    field inversion (Montgomery batch-inversion on host ints)."""
    arr = np.asarray(jax.device_get(pts_dev)).reshape(-1, 3, L.NLIMB)
    xs = FQ_CTX.from_mont_np(arr[:, 0])
    ys = FQ_CTX.from_mont_np(arr[:, 1])
    zs = FQ_CTX.from_mont_np(arr[:, 2])
    # batch-invert the nonzero z's
    prefix = []
    acc = 1
    for z in zs:
        prefix.append(acc)
        if z:
            acc = acc * z % P
    inv = pow(acc, -1, P)
    out: list = [None] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        if zs[i]:
            zi = inv * prefix[i] % P
            inv = inv * zs[i] % P
            out[i] = (xs[i] * zi % P, ys[i] * zi % P)
    return out


def fold_planes_host(sums_dev, base_bits: int = 2):
    """(B, P, 3, 16) device plane sums -> B affine MSM results.  Native C
    fold (one projective double/add chain per commitment, ~0.3 ms) when
    available; Python batch-affine + Jacobian Horner otherwise."""
    arr = np.asarray(jax.device_get(sums_dev))
    b, n_planes = arr.shape[0], arr.shape[1]
    from ..native.ec import fold_planes_batch

    res = fold_planes_batch(arr.astype(np.uint32, copy=False), base_bits)
    if res is not None:
        return res
    affine = proj_batch_to_affine_host(arr)
    assert base_bits == 2, "python fallback folds base-4 planes"
    return [
        horner_host(affine[i * n_planes : (i + 1) * n_planes]) for i in range(b)
    ]


def msm_with_tables(tables, scalar_limbs: jnp.ndarray):
    """tables from `_jit_pair_tables` (padded pow2 point count);
    scalar_limbs (B, n, 16) canonical.  Returns B host affine points."""
    sums = plane_sums_batch(tables, scalar_limbs)  # (B, 127, 3, 16)
    return fold_planes_host(sums, base_bits=2)


def msm(points: jnp.ndarray, scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """points (N,3,16) proj Montgomery, scalar_limbs (N,16) canonical.
    Returns the (3,16) projective Montgomery MSM result (device).

    One-shot API (tests, SRS-free callers): builds the pair tables inline.
    The prover reuses per-SRS tables via `msm_with_tables`."""
    points, scalar_limbs = _pad_pow2(points, scalar_limbs)
    tables = _jit_pair_tables(points)
    (res,) = msm_with_tables(tables, scalar_limbs[None])
    return points_to_device([res])[0]


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
    table.  Used to build the SRS powers on device (batched across the N
    scalars, so the 254-step scan is wide, not latency-bound)."""
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
