"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon; plain env overrides don't stick, so we update the jax
config directly before any backend is initialized (conftest runs before test
modules import jax functionality).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: compile time dominates the suite, and the
# kernels/steps under test change rarely relative to runs of the suite
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
