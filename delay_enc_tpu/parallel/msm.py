"""Sharded MSM: points and scalars partitioned across the mesh.

Each device runs the local bit-plane masked-tree MSM over its shard
(ops.msm.msm traced inside shard_map), then the per-device partial sums —
single projective points — are combined with an all_gather + local complete
-add tree (EC addition is not a `psum`-able monoid, and the partials are
48 bytes each, so the gather is trivially cheap on ICI)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import msm as M


def sharded_msm(mesh: Mesh, points: jnp.ndarray, scalar_limbs: jnp.ndarray, axis: str = "shard"):
    """points (N,3,16) proj Montgomery, scalars (N,16) canonical; N divisible
    by the mesh axis size.  Returns the (3,16) MSM result (replicated)."""
    ndev = mesh.shape[axis]
    n = points.shape[0]
    assert n % ndev == 0, f"N={n} not divisible by {ndev} devices"

    def local(pts, scs):
        partial_sum = M.msm(pts, scs)  # (3,16)
        gathered = jax.lax.all_gather(partial_sum, axis)  # (ndev,3,16)
        while gathered.shape[0] > 1:
            half = gathered.shape[0] // 2
            top = M.complete_add(gathered[:half], gathered[half : 2 * half])
            if gathered.shape[0] % 2:
                top = jnp.concatenate([top, gathered[-1:]], axis=0)
            gathered = top
        return gathered[0]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,  # replication via all_gather isn't statically inferable
    )
    return f(points, scalar_limbs)
