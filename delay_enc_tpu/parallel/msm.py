"""Sharded MSM: points and scalars partitioned across the mesh.

Each device computes the 254 bit-plane sums of its point/scalar shard with
the gather-free pair-table kernel (ops/msm.py), then the per-device plane
sums are combined with an all_gather + a *batched* complete-add tree over
the device axis (EC addition is not a `psum`-able monoid; the partials are
127 x 48B per device, trivially cheap on ICI, and the tree is 254-wide so
it is not latency-bound).  The final 2^b-weighted Horner fold runs on the
host, exactly as in the single-chip path (a 253-deep doubling chain is
microseconds in host bignum arithmetic but ~ms/step as batch-1 device
dispatches)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import limbs as L
from ..ops import msm as M


def _local_plane_sums(pts, scs):
    """(n_loc,3,16) x (n_loc,16) -> (127,3,16) base-4 plane sums of the
    shard."""
    tables = M._jit_pair_tables.__wrapped__(pts)  # traced inline (no nested jit)
    sel = M._jit_pair_sel.__wrapped__(scs[None])[0]  # (127, n_loc/2)
    nc = (M.PLANES + M.PLANE_CHUNK - 1) // M.PLANE_CHUNK
    pad = nc * M.PLANE_CHUNK - M.PLANES
    sel = jnp.concatenate([sel, jnp.zeros((pad, sel.shape[1]), sel.dtype)], axis=0)
    sums = M._jit_plane_sums.__wrapped__(tables, sel.reshape(nc, M.PLANE_CHUNK, -1))
    return sums.reshape(nc * M.PLANE_CHUNK, 3, L.NLIMB)[: M.PLANES]


def _tree_over_devices(gathered):
    """(D, 127, 3, 16) -> (127, 3, 16) with batched complete adds."""
    while gathered.shape[0] > 1:
        half = gathered.shape[0] // 2
        top = M.complete_add(gathered[:half], gathered[half : 2 * half])
        if gathered.shape[0] % 2:
            top = jnp.concatenate([top, gathered[-1:]], axis=0)
        gathered = top
    return gathered[0]


def sharded_plane_sums(mesh: Mesh, points: jnp.ndarray, scalar_limbs: jnp.ndarray,
                       axis: str = "shard"):
    """Device part of the sharded MSM: (127,3,16) plane sums, replicated."""
    ndev = mesh.shape[axis]
    n = points.shape[0]
    assert n % ndev == 0, f"N={n} not divisible by {ndev} devices"
    assert (n // ndev) % 2 == 0, "shard size must be even for pair tables"

    def local(pts, scs):
        sums = _local_plane_sums(pts, scs)
        gathered = jax.lax.all_gather(sums, axis)  # (D, 127, 3, 16)
        return _tree_over_devices(gathered)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # replication via all_gather isn't statically inferable
    )
    return f(points, scalar_limbs)


def sharded_msm(mesh: Mesh, points: jnp.ndarray, scalar_limbs: jnp.ndarray,
                axis: str = "shard"):
    """points (N,3,16) proj Montgomery, scalars (N,16) canonical; N divisible
    by the mesh axis size.  Returns the (3,16) MSM result (device)."""
    sums = sharded_plane_sums(mesh, points, scalar_limbs, axis)
    affine = M.proj_batch_to_affine_host(sums)
    return M.points_to_device([M.horner_host(affine)])[0]
