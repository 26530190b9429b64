"""JAX global configuration for the framework.

Limb-arithmetic graphs are wide (hundreds of cheap integer ops per field
multiply); XLA's first compile of such graphs is expensive.  A persistent
compilation cache makes this a one-time cost per (graph, shape) across
processes — essential for both the test suite and the prover CLI.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def configure_jax(cache_dir: str | None = None) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DELAY_ENC_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _CONFIGURED = True
