"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py; unit/integration tests exercise the
exact same jitted code paths on CPU (XLA) with 8 virtual devices so that
multi-chip sharding (tp/dp) is tested without TPU hardware.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
