"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's hardware-gating strategy (SURVEY.md §4): correctness
never depends on pod access.  Sharding tests run on a virtual 8-device CPU
mesh; real-TPU performance is measured by bench.py, not the test suite.

Must run before jax is imported anywhere.
"""

import os
import sys

# Force (not setdefault): the environment may preset JAX_PLATFORMS for the
# real TPU; correctness tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: recompiling the fused permutation on every
# pytest invocation wastes minutes; cached executables load in milliseconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/cuzk_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The environment's TPU platform plugin overrides JAX_PLATFORMS at import
# time; pin the config explicitly as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/cuzk_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass
