"""Base-16 pair-table MSM: half the additions of the base-4 path.

Evolution of ops/msm.py's design (which replaces halo2_proofs' CPU
Pippenger, reference benches/delay_enc.rs:123).  The add tree dominates MSM
cost on TPU — `PLANES * (n/2 - 1)` complete additions per commitment — so
the win comes from fewer, bigger digit planes:

  base-4  pairs: 127 planes x n/2 adds  = 63.5n adds, 16-option tables
  base-16 pairs:  64 planes x n/2 adds  = 32.0n adds, 256-option tables

A 256-way branchless `where` chain would cost more than the adds it saves
(~24K VPU ops per pair-plane), so selection moves to the MXU as an int8
one-hot contraction: for each pair, the 64 plane selectors become a
(256, 64) one-hot matrix and the pair's 256 table entries a (96, 256) int8
matrix (u16 limbs split into offset-128 bytes); one batched
s8 x s8 -> s32 `dot_general` selects all 64 planes' entries at once.
Exactly one entry is selected per row, so the +-128 offset is exact to
undo and there is no accumulation error.

Table memory is 16x base-4 (96 B/entry * 256 * n/2 = 805 MB at n = 2^16),
built once per SRS and disk-cached like the base-4 tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .msm import (
    PLANES as PLANES4,
    _complete_add_array,
    _ll_complete_add,
    _pad_pow2,
    _pt_unpack,
    _u16rows,
    complete_add,
    fold_planes_host,
    identity_proj,
    scalar_bits_from_limbs,
)

SCALAR_BITS = 254
DIGIT_BITS = 4
PLANES = 64  # ceil(254 / 4)
OPTS = 256  # (d_even + 16 * d_odd) pair selectors


# ------------------------------------------------------------- table build

_jit_add_batch = jax.jit(complete_add)


def _jit_pair_tables16(points: jnp.ndarray) -> jnp.ndarray:
    """(n,3,16) projective Montgomery -> (256, n/2, 3, 16) uint16 base-16
    pair tables: option[ce + 16*co] = ce*P_even + co*P_odd.  Built once per
    SRS (refs ops/msm.py:_jit_pair_tables for the base-4 analogue).

    Composed from ~45 calls of ONE jitted batched complete-add rather than
    a single jit: tracing 45 unrolled limb-row additions into one graph is
    ~700K HLO ops (hours of XLA compile); one add is ~16K and compiles in
    minutes, then every call reuses it."""
    pe, po = points[0::2], points[1::2]
    inf = jnp.broadcast_to(identity_proj(), pe.shape)

    def multiples(p):
        """[0P, 1P, ..., 15P] via batched double/add chains."""
        out = [inf, p]
        for k in range(2, 16):
            out.append(_jit_add_batch(out[k - 1], p))
        return out

    e_opts = multiples(pe)
    o_opts = multiples(po)
    opts = [None] * OPTS
    for ce in range(16):
        opts[ce] = e_opts[ce]
    for co in range(1, 16):
        opts[16 * co] = o_opts[co]
    # 225 cross sums: 15 batched adds of 15-wide concatenations (a separate
    # 15x-wide jit shape; acceptable second compile, or fall back to per-ce
    # adds of the base shape)
    m = pe.shape[0]
    for co in range(1, 16):
        cross = _jit_add_batch(
            jnp.concatenate([e_opts[ce] for ce in range(1, 16)], axis=0),
            jnp.concatenate([o_opts[co]] * 15, axis=0),
        )
        for i, ce in enumerate(range(1, 16)):
            opts[ce + 16 * co] = cross[i * m : (i + 1) * m]
    return jnp.stack(opts, axis=0).astype(jnp.uint16)


@jax.jit
def _jit_tables_to_i8(tab_u16: jnp.ndarray) -> jnp.ndarray:
    """(256, m, 3, 16) u16 -> (m, 96, 256) int8 MXU operand: limbs split
    into (lo, hi) bytes, offset by -128; layout [coord*32 + 2*limb + half]
    on the row axis, options on the contraction axis."""
    t = tab_u16.astype(jnp.uint16)
    lo = (t & 0xFF).astype(jnp.uint8)
    hi = (t >> 8).astype(jnp.uint8)
    # (256, m, 3, 16, 2) -> (256, m, 96)
    both = jnp.stack([lo, hi], axis=-1).reshape(t.shape[0], t.shape[1], 96)
    i8 = (both.astype(jnp.int16) - 128).astype(jnp.int8)
    return jnp.transpose(i8, (1, 2, 0))  # (m, 96, 256)


# ---------------------------------------------------------------- selectors

@jax.jit
def _jit_pair_sel16(scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """(..., n, 16) canonical limbs -> (..., 64, n/2) uint8 pair selectors
    (digit16_even + 16 * digit16_odd per plane)."""
    bits = scalar_bits_from_limbs(scalar_limbs)  # (..., 254, n)
    *lead, nb, n = bits.shape
    pad = jnp.zeros((*lead, PLANES * DIGIT_BITS - nb, n), bits.dtype)
    d = jnp.concatenate([bits, pad], axis=-2).reshape(*lead, PLANES, DIGIT_BITS, n)
    w = (1 << jnp.arange(DIGIT_BITS, dtype=jnp.uint32))[:, None]
    d16 = jnp.sum(d * w, axis=-2)  # (..., 64, n) in 0..15
    pairs = d16.reshape(*lead, PLANES, n // 2, 2)
    return (pairs[..., 0] + 16 * pairs[..., 1]).astype(jnp.uint8)


# ---------------------------------------------------------------- plane sums

PLANE_CHUNK16 = 16  # planes per dot/tree launch (bounds HBM temporaries)


def _tree_reduce_rows(x, width):
    """Binary-tree complete-add fold of limb-row tuples over the leading
    (pair) slice axis; mirrors ops/msm.py's chunk() tail strategy."""
    TAIL_W = 64
    while width > TAIL_W:
        h = width // 2
        lo = tuple([r[:h] for r in coord] for coord in x)
        hi = tuple([r[h:] for r in coord] for coord in x)
        x = _ll_complete_add(lo, hi)
        x = tuple(_u16rows(coord) for coord in x)
        width = h
    if width > 1:
        from .msm import P as _P
        one_rows = [int(v) for v in L.int_to_limbs_np((1 << 256) % _P)]

        def fold(_, rows):
            lo = tuple([r[0::2] for r in coord] for coord in rows)
            hi = tuple([r[1::2] for r in coord] for coord in rows)
            summed = _ll_complete_add(lo, hi)
            out = []
            for c, coord in enumerate(summed):
                pad_rows = []
                for i, r in enumerate(coord):
                    fill = one_rows[i] if c == 1 else 0
                    pad = jnp.full(r.shape, fill, jnp.uint16)
                    pad_rows.append(jnp.concatenate([r.astype(jnp.uint16), pad], axis=0))
                out.append(pad_rows)
            return tuple(out)

        x = jax.lax.fori_loop(0, width.bit_length() - 1, fold, x)
    return x


@jax.jit
def _jit_plane_sums16(tab_i8: jnp.ndarray, sel_chunks: jnp.ndarray):
    """tab_i8 (m, 96, 256); sel_chunks (nc, C, m) uint8 -> (nc, C, 3, 16)
    plane sums.  Selection on the MXU (one-hot s8 dot), tree on the VPU."""
    m = tab_i8.shape[0]

    def chunk(sel):  # (C, m)
        C = sel.shape[0]
        iota = jnp.arange(OPTS, dtype=jnp.uint8)
        # (m, 256, C) one-hot
        oh = (sel.T[:, None, :] == iota[None, :, None]).astype(jnp.int8)
        out = jax.lax.dot_general(
            tab_i8, oh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (m, 96, C)
        vals = (out + 128).astype(jnp.uint32)
        from . import msm_pallas as MP

        if MP.enabled() and L._backend_unrolls() and m >= MP.STAGE_W:
            # fused Pallas tree: (m, 96, C) -> (C, 48, m) u32 rows
            limb = vals.reshape(m, 3, 16, 2, C)
            limb = limb[..., 0, :] + (limb[..., 1, :] << 8)  # (m, 3, 16, C)
            rows = jnp.transpose(limb.reshape(m, 48, C), (2, 1, 0))
            return MP.tree_reduce(rows)  # (C, 3, 16)
        if L._backend_unrolls():
            rows = tuple(
                [
                    vals[:, c * 32 + 2 * i, :] + (vals[:, c * 32 + 2 * i + 1, :] << 8)
                    for i in range(L.NLIMB)
                ]
                for c in range(3)
            )  # rows shaped (m, C)
            x = _tree_reduce_rows(rows, m)
            pt = jnp.stack(
                [jnp.stack([r[0] for r in coord], axis=-1) for coord in x], axis=-2
            )  # (C, 3, 16)
            return pt
        # CPU fallback: array-form tree (compact scan graphs)
        limb = (
            vals.reshape(m, 3, 16, 2, C)[..., 0, :]
            + (vals.reshape(m, 3, 16, 2, C)[..., 1, :] << 8)
        )  # (m, 3, 16, C)
        x = jnp.moveaxis(limb, -1, 0)  # (C, m, 3, 16)
        x = jnp.swapaxes(x, 0, 1)  # (m, C, 3, 16)
        while x.shape[0] > 1:
            h = x.shape[0] // 2
            x = _complete_add_array(x[:h], x[h : 2 * h])
        return x[0]

    return jax.lax.map(chunk, sel_chunks)


def plane_sums_batch16(tab_i8, scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """tab_i8 from `_jit_tables_to_i8`; scalar_limbs (B, n, 16) canonical.
    Returns (B, 64, 3, 16) plane sums (device)."""
    sel = _jit_pair_sel16(scalar_limbs)  # (B, 64, m)
    b = sel.shape[0]
    flat = sel.reshape(b * PLANES, -1)
    nc = (flat.shape[0] + PLANE_CHUNK16 - 1) // PLANE_CHUNK16
    pad = nc * PLANE_CHUNK16 - flat.shape[0]
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, flat.shape[1]), flat.dtype)], axis=0
        )
    sums = _jit_plane_sums16(tab_i8, flat.reshape(nc, PLANE_CHUNK16, -1))
    return sums.reshape(nc * PLANE_CHUNK16, 3, L.NLIMB)[: b * PLANES].reshape(
        b, PLANES, 3, L.NLIMB
    )


def msm16_with_tables(tab_i8, scalar_limbs: jnp.ndarray):
    """scalar_limbs (B, n, 16) canonical -> B host affine points."""
    sums = plane_sums_batch16(tab_i8, scalar_limbs)
    return fold_planes_host(sums, base_bits=DIGIT_BITS)


def msm16(points: jnp.ndarray, scalar_limbs: jnp.ndarray):
    """One-shot API (tests): builds tables inline, returns B affine."""
    points, scalar_limbs = _pad_pow2(points, scalar_limbs)
    tab = _jit_pair_tables16(points)
    return msm16_with_tables(_jit_tables_to_i8(tab), scalar_limbs[None])
