"""Device-mesh helpers.

The reference's only parallelism is rayon multicore inside halo2_proofs
(SURVEY §2.3); here scale-out is expressed as JAX collectives over an
explicit mesh — `psum`/`all_gather`/`ppermute`/`all_to_all` inside
shard_map, riding ICI within a slice (and DCN across hosts) with no custom
transport layer.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    from jax.sharding import AxisType

    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return jax.make_mesh(
        (len(devs),), (axis,), devices=devs, axis_types=(AxisType.Auto,)
    )
