"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (SURVEY.md §4).

The environment's axon TPU plugin force-registers itself at interpreter
start and overrides JAX_PLATFORMS via jax.config, so we must override the
config *after* importing jax, before any backend is touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("JAX_REQUIRE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
