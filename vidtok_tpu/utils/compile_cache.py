"""Persistent XLA compilation cache setup.

Cold compiles through the axon TPU relay take 15-25 minutes for the full
fused bench graph — longer than the driver's bench timeout (round-2's
BENCH_r02.json was rc=124 for exactly this reason). Enabling JAX's
persistent compilation cache lets a fresh ``python bench.py`` process
reuse executables compiled by an earlier (builder-run) warmup, so the
driver's cold process completes in seconds of compile time instead of
minutes.

Call :func:`enable_persistent_cache` before any jit compilation. The
cache lives in ``<repo>/.xla_cache`` (gitignored — machine-local
serialized executables, not source).
"""

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".xla_cache")


def enable_persistent_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> str:
    """Enable the on-disk XLA compilation cache; returns the cache dir.

    Every compile (no minimum time / entry size) is cached: the bench and
    driver-entry graphs are exactly the ones we need warm, and the cache
    dir is private to this repo so unbounded growth is not a concern.
    """
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
