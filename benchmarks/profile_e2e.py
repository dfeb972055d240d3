"""Per-HLO-op profile of the REAL fused txt2img program (pipeline.generate's
one-dispatch jit), not the isolated UNet chain — locates pipeline-level glue
(sampler arithmetic, CFG combine, latent init, decode, u8 convert) that the
UNet step profile can't see.

Run on chip: python benchmarks/profile_e2e.py  [E2E_STEPS=50 E2E_BATCH=1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.op_profile import report
from bench import build_pipeline


def main():
    print(f"backend={jax.default_backend()}")
    steps = int(os.environ.get("E2E_STEPS", "50"))
    batch = int(os.environ.get("E2E_BATCH", "1"))
    pipe = build_pipeline("1.5", int8=os.environ.get("E2E_INT8", ""))
    cond = np.zeros((batch, 77), np.int64)
    unc = np.ones((batch, 77), np.int64)

    def run(seed):
        return pipe.generate(
            prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=steps,
            sampler="ddim", img_size=(512, 512), batch_size=batch,
            cond_ids=cond, uncond_ids=unc, seed=seed,
            output_dtype="uint8",
        )

    out = run(0)  # compile
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    t0 = time.perf_counter()
    run(1)
    dt = time.perf_counter() - t0
    print(f"e2e txt2img b{batch} {steps} steps: {dt*1e3:.1f} ms wall")
    logdir = "/tmp/e2e_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    run(2)
    jax.profiler.stop_trace()
    report(logdir, 1)


if __name__ == "__main__":
    main()
