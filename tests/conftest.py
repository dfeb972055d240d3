"""Test config: force CPU with 8 virtual devices (the TPU answer to testing
multi-chip sharding without a cluster — SURVEY section 4) and keep everything
tiny: this box has a single CPU core.

The container's sitecustomize registers the axon TPU backend and pins
JAX_PLATFORMS=axon, so we override via jax.config (which wins over env)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")  # parity tests are CPU-exact

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-size (real-topology) parity tests; deselect with -m 'not slow'",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
