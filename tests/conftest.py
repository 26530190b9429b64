import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; set this
# before jax is imported anywhere in the test session.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import delay_enc_tpu  # noqa: E402,F401  (enables the persistent compile cache)
