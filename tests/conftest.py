"""Test configuration: pin tests to the host CPU backend (8 virtual devices)
so unit tests don't round-trip through the TPU tunnel and multi-chip sharding
logic is exercised without TPU hardware.

Note: the environment force-registers the TPU ('axon') backend regardless of
JAX_PLATFORMS, so we pin the default device to CPU explicitly.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def goldens():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if not os.path.isfile(path):
            pytest.skip(f"golden fixture {name} not generated")
        return np.load(path)
    return load
