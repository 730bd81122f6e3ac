"""Test harness config: force an 8-device virtual CPU mesh before jax import.

All tests run on CPU (the driver may not expose a TPU at test time); sharding
tests exercise real pjit/shard_map over the 8 virtual devices.
"""

import os

# 8 virtual CPU devices for sharding tests; must be set before backend init.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

# The env may pin JAX_PLATFORMS=axon (TPU); the config update below wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
