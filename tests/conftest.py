"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform device virtualization instead (same
SPMD partitioner, same collectives). Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms='axon,cpu', overriding JAX_PLATFORMS. Tests must run on the
# virtual CPU mesh (and must not fight over the single real TPU chip), so
# force the config back before any backend initialization.
jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge._backends, (
    "jax backends initialized before conftest could force CPU")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
