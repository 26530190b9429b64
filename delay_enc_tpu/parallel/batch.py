"""Data-parallel batch commitment: many polynomials (or many proof
instances' columns) committed concurrently, sharded over the mesh.

This is the DP axis of the framework (BASELINE config 5: many delay_enc
ciphertexts proven in parallel): the SRS is replicated, the batch of
coefficient vectors is sharded on the instance axis, each device runs the
gather-free pair-table plane-sum kernel over its instances; the 254-entry
per-instance plane sums come back sharded and the host folds each with the
Horner doubling chain (see ops/msm.py design notes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import limbs as L
from ..ops import msm as M


def batch_plane_sums(mesh: Mesh, g1_powers: jnp.ndarray, coeff_batch: jnp.ndarray,
                     axis: str = "shard"):
    """g1_powers (n,3,16) replicated; coeff_batch (B,n,16) canonical scalars
    sharded on B.  Returns (B,127,3,16) plane sums, sharded on B."""
    ndev = mesh.shape[axis]
    assert coeff_batch.shape[0] % ndev == 0

    def local(pts, coeffs):
        tables = M._jit_pair_tables.__wrapped__(pts)
        b = coeffs.shape[0]
        sel = M._jit_pair_sel.__wrapped__(coeffs)  # (b, 127, n/2)
        flat = sel.reshape(b * M.PLANES, -1)
        nc = (flat.shape[0] + M.PLANE_CHUNK - 1) // M.PLANE_CHUNK
        pad = nc * M.PLANE_CHUNK - flat.shape[0]
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, flat.shape[1]), flat.dtype)], axis=0
            )
        sums = M._jit_plane_sums.__wrapped__(tables, flat.reshape(nc, M.PLANE_CHUNK, -1))
        return sums.reshape(nc * M.PLANE_CHUNK, 3, L.NLIMB)[: b * M.PLANES].reshape(
            b, M.PLANES, 3, L.NLIMB
        )

    f = shard_map(local, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis))
    return f(g1_powers, coeff_batch)


def batch_commit(mesh: Mesh, g1_powers: jnp.ndarray, coeff_batch: jnp.ndarray,
                 axis: str = "shard"):
    """Returns (B,3,16) commitments (device) for the sharded batch."""
    sums = batch_plane_sums(mesh, g1_powers, coeff_batch, axis)
    b = coeff_batch.shape[0]
    affine = M.proj_batch_to_affine_host(sums)
    return M.points_to_device(
        [
            M.horner_host(affine[i * M.PLANES : (i + 1) * M.PLANES])
            for i in range(b)
        ]
    )
