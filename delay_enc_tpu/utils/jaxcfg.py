"""JAX global configuration for the framework.

Limb-arithmetic graphs are wide (hundreds of cheap integer ops per field
multiply); XLA's first compile of such graphs is expensive.  A persistent
compilation cache makes this a one-time cost per (graph, shape) across
processes — essential for both the test suite and the prover CLI.

The cache is TPU-only: TPU executables are portable across same-generation
chips, so they share one repo-local directory.  The CPU backend runs with NO
persistent cache — its scan-form limb kernels compile in seconds, XLA:CPU
AOT entries are locked to the compiling machine's CPU features
(cpu_aot_loader mismatch errors on any other host), and large cache writes
have crashed the zstd compressor under memory pressure.
"""

from __future__ import annotations

import os

_CONFIGURED = False


def configure_jax(cache_dir: str | None = None) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    import jax

    cache_dir = cache_dir or os.environ.get("DELAY_ENC_TPU_JAX_CACHE")
    if cache_dir is None:
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if backend == "cpu":
            # No persistent cache on CPU: the scan-form limb kernels compile
            # in seconds there, while AOT cache entries are machine-feature
            # locked (cpu_aot_loader mismatch errors) and large cache writes
            # have crashed the zstd compressor under memory pressure.
            _mark_configured()
            return
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    _mark_configured()


def _mark_configured() -> None:
    global _CONFIGURED
    _CONFIGURED = True
