"""Data-parallel batch commitment: many polynomials (or many proof
instances' columns) committed concurrently, sharded over the mesh.

This is the DP axis of the framework (BASELINE config 5: many delay_enc
ciphertexts proven in parallel): the SRS is replicated, the batch of
coefficient vectors is sharded, each device runs the local MSM kernel over
its instances."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import msm as M


def batch_commit(mesh: Mesh, g1_powers: jnp.ndarray, coeff_batch: jnp.ndarray, axis: str = "shard"):
    """g1_powers (n,3,16) replicated; coeff_batch (B,n,16) canonical scalars
    sharded on B.  Returns (B,3,16) commitments, sharded on B."""
    ndev = mesh.shape[axis]
    assert coeff_batch.shape[0] % ndev == 0

    def local(pts, coeffs):
        return jax.vmap(lambda s: M.msm(pts, s))(coeffs)

    f = shard_map(local, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis))
    return f(g1_powers, coeff_batch)
