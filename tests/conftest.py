"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual XLA devices so that sharding / pjit /
shard_map code paths are exercised without TPU hardware (SURVEY.md §4).
Flags must be set before jax is imported anywhere in the process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force (env presets axon/TPU)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the environment's sitecustomize imports jax at interpreter start (before
# this conftest runs), locking JAX_PLATFORMS=axon — override via config
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
