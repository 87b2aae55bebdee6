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
