"""Fast-tier sharded smoke: mesh + shard_map plumbing checked on every run
(the full sharded-kernel suite in test_parallel.py is marked slow — its
XLA:CPU compiles take minutes).  Uses the scan-form limb kernels, which
compile in seconds on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from delay_enc_tpu.fields import FR
from delay_enc_tpu.ops import limbs as L
from delay_enc_tpu.parallel import make_mesh


def test_sharded_mont_mul_matches_host():
    assert len(jax.devices()) >= 8, "tests need the 8-device CPU mesh"
    mesh = make_mesh(8)
    axis = mesh.axis_names[0]
    rng = np.random.default_rng(11)
    xs = [FR.random(rng) for _ in range(16)]
    ys = [FR.random(rng) for _ in range(16)]
    a = jnp.asarray(L.FR_CTX.to_mont_np(xs))
    b = jnp.asarray(L.FR_CTX.to_mont_np(ys))

    f = shard_map(
        lambda u, v: L.mont_mul(L.FR_CTX, u, v),
        mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis),
    )
    out = jax.jit(f)(a, b)
    got = L.FR_CTX.from_mont_np(np.asarray(jax.device_get(out)))
    assert got == [x * y % FR.p for x, y in zip(xs, ys)]
