"""Test-session JAX setup.

The CI/test environment may force a TPU PJRT plugin platform through
sitecustomize (overriding JAX_PLATFORMS env).  Tests must run on a virtual
multi-device CPU mesh, so we override jax_platforms via jax.config AFTER
import — config.update beats the sitecustomize setting as long as no
backend has been initialized yet — and request 8 CPU devices for the
sharding tests."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import delay_enc_tpu  # noqa: E402,F401  (enables the persistent compile cache)
