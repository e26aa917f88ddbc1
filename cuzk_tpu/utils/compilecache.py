"""Shared persistent-XLA-compile-cache bootstrap.

Compiles are expensive everywhere in this project — minutes per Mosaic
kernel over the TPU tunnel, ~1 minute per sponge bucket on XLA:CPU
(docs/PERF.md) — so every entry point (bench CLIs, the driver entry, the
test suite, multiprocess workers) enables the shared on-disk cache.  One
definition here instead of a copy-pasted setdefault pair per script.

Importing this module pulls no JAX: it must be usable BEFORE jax
initializes (env vars only take effect then).
"""

import os

DEFAULT_CACHE_DIR = "/tmp/cuzk_tpu_jax_cache"


def enable_compile_cache(pin_config: bool = False) -> str:
    """Point JAX's persistent compilation cache at the shared directory.

    Respects an already-set ``JAX_COMPILATION_CACHE_DIR`` (e.g. ``make
    test-cold`` overrides it with a throwaway dir to measure cold-suite
    time).  Call before the first jax import; with ``pin_config`` the jax
    config is updated as well, which also wins when a platform plugin
    already initialized config defaults.  Returns the cache dir in use.
    """
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    if pin_config:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
