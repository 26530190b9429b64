"""JAX global configuration for the framework.

Limb-arithmetic graphs are wide (hundreds of cheap integer ops per field
multiply); XLA's first compile of such graphs is expensive.  A persistent
compilation cache makes this a one-time cost per (graph, shape) across
processes — essential for both the test suite and the prover CLI.

The cache is keyed per backend platform: XLA:CPU emits AOT code specialized
to the *compiling* machine's CPU features, so a cache written on one host is
useless (or harmful — cpu_aot_loader feature-mismatch errors) on another.
TPU executables are portable across same-generation chips, so TPU entries
share one directory while CPU entries go to a per-CPU-feature-set directory
under the user cache dir (never the repo).
"""

from __future__ import annotations

import os

_CONFIGURED = False


def _cpu_cache_dir() -> str:
    """Per-machine CPU cache location (outside the repo)."""
    import hashlib
    import platform

    tag = hashlib.blake2b(
        f"{platform.machine()}:{platform.processor()}".encode(), digest_size=8
    ).hexdigest()
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "delay_enc_tpu", f"xla_cpu_{tag}")


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
