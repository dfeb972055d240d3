"""Per-HLO-op profile of the REAL fused pipeline programs (the one-dispatch
jits behind generate / generate_in_one_step), not isolated UNet chains —
locates pipeline-level glue (sampler arithmetic, CFG combine, latent init,
decode, u8 convert) that the UNet step profile can't see.

Run on chip:
  python benchmarks/profile_e2e.py                         # txt2img b1
  E2E_CONFIG=img2img python benchmarks/profile_e2e.py      # config 2, b4
  E2E_CONFIG=sd21_768 python benchmarks/profile_e2e.py     # config 3
  E2E_CONFIG=one_step python benchmarks/profile_e2e.py     # config 5, b32
Env: E2E_STEPS, E2E_BATCH, E2E_INT8 (txt2img only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.op_profile import report
from bench import build_pipeline


def make_runner(config, steps, batch):
    if config == "sd21_768":
        pipe = build_pipeline("2.1")
        cond = np.zeros((1, 77), np.int64)
        unc = np.ones((1, 77), np.int64)

        def run(seed):
            return pipe.generate(
                prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=steps,
                sampler="ddim", img_size=(768, 768), batch_size=1,
                cond_ids=cond, uncond_ids=unc, seed=seed, output_dtype="uint8",
            )

        return run, 1

    if config == "img2img":
        pipe = build_pipeline("1.5")
        b = 4
        cond = np.zeros((b, 77), np.int64)
        unc = np.ones((b, 77), np.int64)
        lat = np.random.default_rng(0).standard_normal((b, 64, 64, 4), np.float32)

        def run(seed):
            return pipe.generate(
                prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=steps,
                sampler="ddpm", use_cosine_schedule=True, strength=0.8,
                img_size=(512, 512), batch_size=b, cond_ids=cond,
                uncond_ids=unc, seed=seed, input_latents=lat,
                output_dtype="uint8",
            )

        return run, b

    if config == "one_step":
        pipe = build_pipeline("1.5")
        cond = np.zeros((1, 77), np.int64)

        def run(seed):
            return pipe.generate_in_one_step(
                prompt="", img_size=(512, 512), batch_size=32, cond_ids=cond,
                seed=seed, output_dtype="uint8",
            )

        return run, 32

    pipe = build_pipeline("1.5", int8=os.environ.get("E2E_INT8", ""))
    cond = np.zeros((batch, 77), np.int64)
    unc = np.ones((batch, 77), np.int64)

    def run(seed):
        return pipe.generate(
            prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=steps,
            sampler="ddim", img_size=(512, 512), batch_size=batch,
            cond_ids=cond, uncond_ids=unc, seed=seed, output_dtype="uint8",
        )

    return run, batch


def main():
    print(f"backend={jax.default_backend()}")
    config = os.environ.get("E2E_CONFIG", "txt2img")
    steps = int(os.environ.get("E2E_STEPS", "50"))
    batch = int(os.environ.get("E2E_BATCH", "1"))
    run, b = make_runner(config, steps, batch)

    out = run(0)  # compile
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    t0 = time.perf_counter()
    run(1)
    dt = time.perf_counter() - t0
    print(f"e2e {config} b{b}: {dt*1e3:.1f} ms wall ({b/dt:.3f} img/s)")
    logdir = f"/tmp/e2e_profile_{config}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    run(2)
    jax.profiler.stop_trace()
    report(logdir, 1)


if __name__ == "__main__":
    main()
