"""Probe whether host-fetch of a finished batch overlaps the next batch's
device compute on this transport (axon relay).

Config-5 shape (SwiftBrush one-step, b32, uint8 output).  Timings:
  dev    — dispatch + block_until_ready, NO host fetch (device-only floor)
  seq    — dispatch then np.asarray each iteration (round-2 bench semantics)
  pipe   — dispatch batch k+1 BEFORE fetching batch k (round-3 steady state)
  pipe2  — TWO batches in flight: dispatch k+1 and k+2 before fetching k,
           giving batch k's transfer a second full compute window to hide in
  thread — a single reader thread owns every np.asarray; the main thread
           only dispatches, so batch k's fetch overlaps batch k+1's host
           dispatch work too (np.asarray releases the GIL inside the
           runtime's literal-fetch, so the two genuinely run concurrently)
  async  — copy_to_host_async(cur) immediately after dispatching cur, so
           the runtime enqueues the D2H behind cur's compute and starts it
           the moment compute ends — without waiting for the host to reach
           np.asarray one iteration later

If pipe ~= max(dev, fetch) < seq, the transfer overlaps compute and a
pipelined serving mode is worth exposing (pipeline.generate device_output).
pipe2/thread measure the round-4 question (VERDICT weak #2): the ~100 ms/
batch still missing from pipe vs dev — is it transfer tail or dispatch-side
host work, and which scheme recovers it.
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

    # two in flight: fetch k only after k+1 AND k+2 are dispatched
    p2, p1 = dispatch(200), dispatch(201)
    t0 = time.perf_counter()
    for i in range(202, 202 + REPS):
        cur = dispatch(i)
        out2 = np.asarray(p2)
        p2, p1 = p1, cur
    pipe2_t = (time.perf_counter() - t0) / REPS
    np.asarray(p2), np.asarray(p1)
    assert out2.shape == out.shape

    # async D2H: enqueue the host copy at dispatch time so the runtime
    # starts it the instant compute finishes; asarray then just waits
    prev = dispatch(400)
    prev.copy_to_host_async()
    t0 = time.perf_counter()
    for i in range(401, 401 + REPS):
        cur = dispatch(i)
        cur.copy_to_host_async()
        out4 = np.asarray(prev)
        prev = cur
    async_t = (time.perf_counter() - t0) / REPS
    np.asarray(prev)
    assert out4.shape == out.shape

    # reader thread: main thread dispatches, one worker owns the fetches
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(np.asarray, dispatch(300))
        t0 = time.perf_counter()
        for i in range(301, 301 + REPS):
            cur = dispatch(i)
            nxt = ex.submit(np.asarray, cur)
            out3 = fut.result()
            fut = nxt
        thread_t = (time.perf_counter() - t0) / REPS
        fut.result()
    assert out3.shape == out.shape

    print(f"dev-only : {dev*1e3:8.1f} ms/batch  ({32/dev:6.2f} img/s)")
    print(f"seq fetch: {seq*1e3:8.1f} ms/batch  ({32/seq:6.2f} img/s)")
    print(f"pipelined: {pipe_t*1e3:8.1f} ms/batch  ({32/pipe_t:6.2f} img/s)")
    print(f"2-inflite: {pipe2_t*1e3:8.1f} ms/batch  ({32/pipe2_t:6.2f} img/s)")
    print(f"async-d2h: {async_t*1e3:8.1f} ms/batch  ({32/async_t:6.2f} img/s)")
    print(f"rd-thread: {thread_t*1e3:8.1f} ms/batch  ({32/thread_t:6.2f} img/s)")
    print(f"fetch cost seq={1e3*(seq-dev):.1f} ms, hidden by pipeline: "
          f"{1e3*(seq-pipe_t):.1f} ms, residual vs dev: pipe "
          f"{1e3*(pipe_t-dev):+.1f} / 2-inflight {1e3*(pipe2_t-dev):+.1f} / "
          f"async {1e3*(async_t-dev):+.1f} / thread {1e3*(thread_t-dev):+.1f} ms")


if __name__ == "__main__":
    main()
