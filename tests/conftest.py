"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so all sharding/collective
tests run against 8 virtual CPU devices (the supported way to validate GSPMD
programs without a pod). The host environment may pre-register a TPU plugin
and force it via ``jax.config.jax_platforms``, so we override the config —
not just the env var — before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TESTING", "true")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles the same tiny-model
# programs in many tests; caching them across processes/runs cuts minutes.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/instageo_jax_cache")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
