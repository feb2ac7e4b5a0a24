"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py; unit/integration tests exercise
the exact same jitted code paths on CPU (XLA) with 8 virtual devices so that
multi-chip sharding (tp/dp) is tested without TPU hardware.

NOTE: this environment pre-imports jax and registers the TPU platform via a
sitecustomize hook (PYTHONPATH), so setting JAX_PLATFORMS in os.environ is
too late — we must override through jax.config before any backend
initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
