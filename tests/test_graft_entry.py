"""Driver-contract tests for __graft_entry__.py.

The round-1 failure mode: the driver calls dryrun_multichip() from a process
whose (single-chip) backend is ALREADY initialized, so jax_platforms can no
longer be flipped to CPU and no XLA flag can conjure virtual devices.  The
fix re-execs the sharded step in a fresh interpreter; this test reproduces
the driver's environment — spawn a python that first initializes a 1-device
backend, then calls dryrun_multichip(4) — and requires it to succeed.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy  # spawns a fresh interpreter running the dryrun

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_from_initialized_backend():
    code = f"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 1, jax.devices()   # backend now initialized, 1 device
sys.path.insert(0, {REPO!r})
import __graft_entry__ as g
g.dryrun_multichip(4)
"""
    env = dict(os.environ)
    # a frozen 1-device backend, like the driver's (axon would be minutes
    # of TPU registration; the failure mode only needs "initialized + <n")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_SD_TPU_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(4)" in proc.stdout
