"""Probe whether host-fetch of a finished batch overlaps the next batch's
device compute on this transport (axon relay).

Config-5 shape (SwiftBrush one-step, b32, uint8 output).  Three timings:
  dev   — dispatch + block_until_ready, NO host fetch (device-only floor)
  seq   — dispatch then np.asarray each iteration (current bench semantics)
  pipe  — dispatch batch k+1 BEFORE fetching batch k (steady-state serving)

If pipe ~= max(dev, fetch) < seq, the transfer overlaps compute and a
pipelined serving mode is worth exposing (pipeline.generate device_output).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_pipeline  # noqa: E402
from stable_diffusion_tpu import pipeline as P  # noqa: E402

REPS = 5


def main():
    pipe = build_pipeline("1.5")
    cond = jnp.asarray(np.zeros((1, 77), np.int64))

    def dispatch(seed):
        return P._one_step_full_jit(
            pipe.params, cond, jax.random.key(seed), (32, 64, 64, 4), 32,
            pipe.unet_config, pipe.text_config, pipe.vae_config, pipe.impl,
            pipe.dtype, True,
        )

    np.asarray(dispatch(0))  # compile + warmup

    t0 = time.perf_counter()
    for i in range(1, REPS + 1):
        dispatch(i).block_until_ready()
    dev = (time.perf_counter() - t0) / REPS

    t0 = time.perf_counter()
    for i in range(REPS + 1, 2 * REPS + 1):
        np.asarray(dispatch(i))
    seq = (time.perf_counter() - t0) / REPS

    prev = dispatch(100)
    t0 = time.perf_counter()
    for i in range(101, 101 + REPS):
        cur = dispatch(i)
        out = np.asarray(prev)
        prev = cur
    pipe_t = (time.perf_counter() - t0) / REPS
    np.asarray(prev)
    # _finalize_images lane-packs device outputs as (b, h, w*3)
    assert out.dtype == np.uint8 and out.shape == (32, 512, 1536)

    print(f"dev-only : {dev*1e3:8.1f} ms/batch  ({32/dev:6.2f} img/s)")
    print(f"seq fetch: {seq*1e3:8.1f} ms/batch  ({32/seq:6.2f} img/s)")
    print(f"pipelined: {pipe_t*1e3:8.1f} ms/batch  ({32/pipe_t:6.2f} img/s)")
    print(f"fetch cost seq={1e3*(seq-dev):.1f} ms, hidden by pipeline: "
          f"{1e3*(seq-pipe_t):.1f} ms")


if __name__ == "__main__":
    main()
