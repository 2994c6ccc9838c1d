"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Mirrors the reference's CI policy (tests pass with no special hardware /
data, SURVEY.md §4): all tests run on CPU-backend JAX; multi-device sharding
tests use the 8 virtual devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin's sitecustomize registers itself and programmatically
# sets jax_platforms="axon,cpu", overriding the env var — force CPU here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
