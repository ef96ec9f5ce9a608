"""Test-suite configuration.

Tests run on CPU with 8 virtual XLA devices so sharded (pjit/shard_map) code
paths execute without TPU hardware (the env vars must be set before JAX is
imported anywhere). Numerics funnel through the same jitted code the TPU runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax with JAX_PLATFORMS=axon already baked
# into the config default — force the test suite onto CPU regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Per-test seeded RNG so each test draws a deterministic stream
    regardless of execution order (the reference seeds default_rng(12345)
    once per session; a shared stream makes tests order-dependent)."""
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(24)
