"""Test harness: force an 8-device virtual CPU mesh BEFORE jax import so
multi-device sharding tests run without TPU hardware (SURVEY §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon; override both the env var
# and the config so tests always run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: most suite wall-clock is XLA compiles of
# near-identical tiny graphs; cache them across tests AND runs.
import os as _os  # noqa: E402

_cache_dir = _os.path.join(_os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
