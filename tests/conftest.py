"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; the bench runs on the one real chip).

The environment's sitecustomize registers an `axon` TPU backend and forces
JAX_PLATFORMS=axon; we override to CPU *before* any backend initializes
(jax is already imported by sitecustomize, so plain env vars are too late —
use jax.config, which wins as long as no computation ran yet).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running e2e test")
