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

# Persistent compilation cache: the suite's wall-clock on this single-core
# box is dominated by XLA:CPU compiles of the same tiny programs every run
# (fast tier measured 26 min cold).  The cache keys on the HLO hash, so code
# changes that alter a traced program recompile automatically; unchanged
# programs load in milliseconds.  SD_TPU_TEST_NO_CACHE=1 disables.
if os.environ.get("SD_TPU_TEST_NO_CACHE", "") != "1":
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-size (real-topology) parity tests; deselect with -m 'not slow'",
    )


# Release compiled executables between test MODULES.  A full-suite run in one
# process accumulates hundreds of loaded XLA:CPU executables (each holds JIT
# code mappings); ~140 tests in, the process aborts (SIGABRT, no Python
# exception) inside backend.deserialize_executable on a persistent-cache READ
# — resource exhaustion in the C++ runtime, not a corrupt entry (every entry
# loads fine in a fresh process; vm.max_map_count is the prime suspect).
# jax.clear_caches() drops the pjit caches so the executables free; re-jits
# reload from the persistent disk cache above in milliseconds.
_last_module = [None]


def pytest_runtest_setup(item):
    mod = getattr(item, "module", None)
    name = getattr(mod, "__name__", None)
    if name != _last_module[0]:
        if _last_module[0] is not None:
            jax.clear_caches()
        _last_module[0] = name


@pytest.fixture
def rng():
    return np.random.default_rng(0)
