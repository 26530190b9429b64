"""Pallas TPU kernels for the hot field/curve primitives.

The jnp limb kernels express per-limb chains as lax.scans: tiny XLA graphs,
but ~hundreds of sequential micro-kernels per EC operation and huge HBM
intermediates (the (…,16,16) schoolbook products).  These Pallas kernels
fuse a whole operation per grid block instead:

 * all intermediates live in VMEM (nothing spills to HBM),
 * one kernel launch per operation (the MSM tree becomes ~log2(n) launches),
 * the fully unrolled limb chains compile quickly under Mosaic.

`complete_add_pallas` is the flagship: the entire Renes-Costello-Batina
complete addition (12 Montgomery muls + b3 scalings) in one kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L
from .limbs import FQ_CTX, NLIMB

BLOCK = 512  # points per grid block; VMEM: ~BLOCK*16*16*4B per live product


def _complete_add_kernel(p_ref, q_ref, o_ref):
    from .msm import _complete_add_impl

    with L.force_unroll():
        o_ref[...] = _complete_add_impl(p_ref[...], q_ref[...])


def complete_add_pallas(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 16) x (…, 3, 16) -> (…, 3, 16), batched complete addition."""
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    p = jnp.broadcast_to(p, shape)
    q = jnp.broadcast_to(q, shape)
    lead = shape[:-2]
    n = 1
    for d in lead:
        n *= int(d)
    pf = p.reshape(n, 3, NLIMB)
    qf = q.reshape(n, 3, NLIMB)
    block = min(BLOCK, n)
    pad = (-n) % block
    if pad:
        pf = jnp.concatenate([pf, pf[:pad]], axis=0)
        qf = jnp.concatenate([qf, qf[:pad]], axis=0)
    grid = (pf.shape[0] // block,)
    out = pl.pallas_call(
        _complete_add_kernel,
        out_shape=jax.ShapeDtypeStruct(pf.shape, jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 3, NLIMB), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, 3, NLIMB), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, 3, NLIMB), lambda i: (i, 0, 0)),
    )(pf, qf)
    if pad:
        out = out[:n]
    return out.reshape(shape)


def _mont_mul_kernel(a_ref, b_ref, o_ref):
    with L.force_unroll():
        o_ref[...] = L.mont_mul(FQ_CTX, a_ref[...], b_ref[...])


def mont_mul_fq_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Fq Montgomery multiply as a single fused kernel."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, NLIMB)
    b = jnp.broadcast_to(b, shape).reshape(-1, NLIMB)
    n = a.shape[0]
    block = min(4 * BLOCK, n)
    pad = (-n) % block
    if pad:
        a = jnp.concatenate([a, a[:pad]], axis=0)
        b = jnp.concatenate([b, b[:pad]], axis=0)
    out = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=(a.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((block, NLIMB), lambda i: (i, 0)),
            pl.BlockSpec((block, NLIMB), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block, NLIMB), lambda i: (i, 0)),
    )(a, b)
    if pad:
        out = out[:n]
    return out.reshape(shape)
