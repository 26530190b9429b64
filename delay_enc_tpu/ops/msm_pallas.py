"""Pallas TPU kernels for the MSM plane-sum addition tree.

The MSM's cost center is the per-plane binary tree of complete point
additions (ops/msm.py, ops/msm16.py).  The XLA limb-row formulation is a
per-level sequence of fused elementwise kernels with (48, W)-u32
materialization between levels; this module fuses several tree levels into
one Pallas kernel so intermediates stay in VMEM.

Layout (the lesson from the round-1/2 Mosaic attempts, which hung on
(..., 3, 16) limb-minor blocks): the PAIR axis is the lane axis.  A block
is (48, W) uint32 — 48 sublane rows = 3 coordinates x 16 limbs, W lanes =
points — so every op in the Montgomery chains is a full-width vector op
with no relayouts.  Tree levels halve W by lane-aligned slicing while
W >= 2*MIN_W; the final MIN_W -> 1 fold runs in XLA (a handful of tiny
kernels).

`LEVELS_PER_STAGE` bounds the traced ops per kernel body (one complete
addition is ~16K traced integer ops; Mosaic's compile time grows with body
size), so a stage reduces W by 2^LEVELS_PER_STAGE per grid step and the
caller loops stages.

Gated by DELAY_ENC_PALLAS_TREE=1 (default off until TPU-validated):
ops/msm.py consults `enabled()`.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.bn254 import FQ
from . import limbs as L

ROWS = 48  # 3 coords x 16 limbs
MIN_W = 128  # one full lane tile; the tail below this folds in XLA
LEVELS_PER_STAGE = 2  # W -> W/4 per kernel body (~33K traced ops)
STAGE_W = MIN_W << LEVELS_PER_STAGE  # input lanes per grid block


def enabled() -> bool:
    return os.environ.get("DELAY_ENC_PALLAS_TREE", "0") == "1"


def _rows_of(x):
    """(48, W) block -> (X, Y, Z) limb-row lists of (1, W) slices."""
    return tuple(
        [x[16 * c + i : 16 * c + i + 1, :] for i in range(16)] for c in range(3)
    )


def _pack_rows(t):
    return jnp.concatenate([r for coord in t for r in coord], axis=0)


def _tree_body(x, levels: int):
    """levels lane-halving complete-add tree levels on a (48, W) block."""
    from .msm import _ll_complete_add

    with L.force_unroll():
        for _ in range(levels):
            w = x.shape[-1]
            lo = _rows_of(x[:, : w // 2])
            hi = _rows_of(x[:, w // 2 :])
            out = _ll_complete_add(lo, hi)
            x = _pack_rows(out).astype(jnp.uint32)
    return x


def _stage_kernel(x_ref, o_ref, *, levels: int):
    # block is (1, 48, W): drop the plane axis for the (rows, lanes) body
    o_ref[...] = _tree_body(x_ref[0].astype(jnp.uint32), levels)[None]


def _stage(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(C, 48, W) -> (C, 48, W / 2^LEVELS_PER_STAGE) via one pallas_call
    with grid (C, W // STAGE_W)."""
    c, rows, w = x.shape
    assert rows == ROWS and w % STAGE_W == 0, (x.shape,)
    out_w = STAGE_W >> LEVELS_PER_STAGE
    return pl.pallas_call(
        partial(_stage_kernel, levels=LEVELS_PER_STAGE),
        out_shape=jax.ShapeDtypeStruct((c, ROWS, (w // STAGE_W) * out_w), jnp.uint32),
        grid=(c, w // STAGE_W),
        in_specs=[
            pl.BlockSpec((1, ROWS, STAGE_W), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROWS, out_w), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def tree_reduce(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(C, 48, W) u32 plane blocks -> (C, 3, 16) plane sums.  W must be a
    power of two >= STAGE_W.  Pallas stages fold lanes down to MIN_W; the
    MIN_W -> 1 tail runs as XLA limb-row adds (log2(MIN_W) tiny kernels)."""
    from .msm import _ll_complete_add

    c, rows, w = x.shape
    assert rows == ROWS and w & (w - 1) == 0 and w >= STAGE_W, (x.shape,)
    while x.shape[-1] > MIN_W:
        if x.shape[-1] < STAGE_W:
            # below one stage width: single-level XLA halving
            half = x.shape[-1] // 2
            t = _ll_xla_level(x, half)
            x = t
            continue
        x = _stage(x, interpret=interpret)
    # XLA tail: MIN_W -> 1
    rows_t = tuple(
        [x[:, 16 * cc + i, :] for i in range(16)] for cc in range(3)
    )
    width = x.shape[-1]
    while width > 1:
        half = width // 2
        lo = tuple([r[:, :half] for r in coord] for coord in rows_t)
        hi = tuple([r[:, half:] for r in coord] for coord in rows_t)
        rows_t = _ll_complete_add(lo, hi)
        rows_t = tuple([r.astype(jnp.uint32) for r in coord] for coord in rows_t)
        width = half
    return jnp.stack(
        [jnp.stack([r[:, 0] for r in coord], axis=-1) for coord in rows_t], axis=-2
    )


def _ll_xla_level(x: jnp.ndarray, half: int) -> jnp.ndarray:
    from .msm import _ll_complete_add

    lo = tuple([x[:, 16 * c + i, :half] for i in range(16)] for c in range(3))
    hi = tuple([x[:, 16 * c + i, half:] for i in range(16)] for c in range(3))
    out = _ll_complete_add(lo, hi)
    return jnp.stack([r.astype(jnp.uint32) for coord in out for r in coord], axis=1)
