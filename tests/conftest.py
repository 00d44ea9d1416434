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
