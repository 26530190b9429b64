"""Mosaic compile probe for the MSM Pallas tree kernel (run on real TPU)."""
import time
import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
from delay_enc_tpu.ops import msm_pallas as MP

rng = np.random.default_rng(0)
# one stage at production geometry: (C=16 planes, 48 rows, 4096 lanes)
x = jnp.asarray(rng.integers(0, 1 << 16, (16, 48, 4096), dtype=np.uint32))
t0 = time.time()
y = MP._stage(x)
y.block_until_ready()
print(f"stage compile+run: {time.time()-t0:.1f}s out={y.shape}", flush=True)
t0 = time.time()
for _ in range(5):
    y = MP._stage(x)
np.asarray(jax.device_get(y[0, 0, :1]))
print(f"stage steady (x5): {(time.time()-t0)/5*1000:.2f} ms", flush=True)

# full reduce at one commitment-plane-chunk scale
x2 = jnp.asarray(rng.integers(0, 1 << 16, (16, 48, 32768), dtype=np.uint32))
t0 = time.time()
r = MP.tree_reduce(x2)
np.asarray(jax.device_get(r))
print(f"tree_reduce 16x32768 compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(5):
    r = MP.tree_reduce(x2)
np.asarray(jax.device_get(r))
print(f"tree_reduce steady (x5): {(time.time()-t0)/5*1000:.2f} ms", flush=True)
