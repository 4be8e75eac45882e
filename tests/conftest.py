"""Test configuration: CPU backend with 8 virtual devices (for sharding tests)
and float64 enabled (GPflow-parity numerics). Must run before jax imports."""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the tunneled
# TPU), which is single-device and must not be contended by the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon (TPU) platform and rewrites
# jax_platforms to "axon,cpu" — force CPU-only again after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is compile-dominated on CPU.
jax.config.update("jax_compilation_cache_dir", "/tmp/oak_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
