"""Per-HLO-op profile of the UNet training fwd+bwd step (b4 512^2, remat),
splitting the backward's time across Pallas kernels / XLA convs / dots /
fusions — locates where the 83%-of-step backward actually goes.

Run on chip: python benchmarks/profile_train.py

TP_FULL=1 profiles the FULL bench train step instead (config 4: frozen text
encode + VAE encode + UNet fwd/bwd + optimizer/EMA, remat off — the exact
program bench_train_step times), against the FLOOR_TRAIN=1 table in
BASELINE.md: 179.7 ms measured vs a 105.5 ms measured-rate floor (59%).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.op_profile import report
from stable_diffusion_tpu.models import unet as unet_m

ITERS = 10


def main_full():
    """Profile the exact bench config-4 program (see bench.bench_train_step):
    chained here as repeated step_fn calls (the step carries its own state
    dependence, so no scan wrapper is needed to defeat DCE)."""
    import numpy as np

    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_pipeline

    print(f"backend={jax.default_backend()}")
    pipe = build_pipeline("1.5")
    remat = os.environ.get("BENCH_TRAIN_REMAT", "0") != "0"
    cfg = T.TrainConfig(rank=128, alpha=128.0, use_ema=True,
                        gradient_checkpointing=remat, grad_accum_steps=2,
                        lora_targets=("q_proj", "k_proj", "v_proj", "out_proj"))
    schedule = S.make_schedule()
    state = T.init_train_state(jax.random.key(0), pipe.params, cfg)
    step_fn = jax.jit(T.make_train_step(
        pipe.params, ucfg=pipe.unet_config, tcfg=pipe.text_config,
        vcfg=pipe.vae_config, schedule=schedule, train_cfg=cfg))
    b = 4
    img = jax.random.normal(jax.random.key(1), (b, 512, 512, 3), jnp.bfloat16)
    t, noise, vnoise = T.sample_batch_noise(jax.random.key(2), img)
    batch = {"images": img, "input_ids": jnp.zeros((b, 77), jnp.int32),
             "t": t, "noise": noise.astype(jnp.bfloat16),
             "vae_noise": vnoise.astype(jnp.bfloat16)}
    state, m = step_fn(state, batch)
    _ = np.asarray(m["loss"])  # compile + warm

    logdir = "/tmp/train_profile_full"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step_fn(state, batch)
    _ = np.asarray(m["loss"])
    dt_step = (time.perf_counter() - t0) / ITERS
    jax.profiler.stop_trace()
    print(f"FULL train step b4 512^2 remat={remat}: {dt_step*1e3:.3f} ms "
          f"({1/dt_step:.3f} steps/s)")
    report(logdir, ITERS)


def main():
    print(f"backend={jax.default_backend()}")
    b = int(os.environ.get("TP_BATCH", "4"))
    res = int(os.environ.get("TP_RES", "64"))
    ucfg = unet_m.UNetConfig.sd15()
    key = jax.random.key(0)
    dt = jnp.bfloat16
    shapes = jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dt), key)
    params = jax.device_put(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    cond = jax.random.normal(key, (b, 77, ucfg.cross_attention_dim), dt)
    t = jnp.asarray([500] * b, jnp.int32)
    x = jax.random.normal(key, (b, res, res, 4), dt)
    target = jax.random.normal(jax.random.key(1), x.shape, dt)

    apply_remat = jax.checkpoint(
        lambda p, xx: unet_m.unet_apply(p, xx, t, cond, ucfg, impl="auto")
    )

    def loss_fn(p, xx):
        out = apply_remat(p, xx)
        return jnp.mean((out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    @jax.jit
    def chain(params, x):
        def body(carry, _):
            p, xx = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, xx)
            # feed grads back into params so nothing is DCE'd
            p2 = jax.tree.map(lambda a, g: a - jnp.asarray(1e-8, a.dtype) * g.astype(a.dtype), p, grads)
            return (p2, xx + jnp.bfloat16(loss.astype(jnp.bfloat16) * 0)), loss

        (p, _), losses = jax.lax.scan(body, (params, x), None, length=ITERS)
        return jax.tree.leaves(p)[0], losses

    out = chain(params, x)
    jax.block_until_ready(out)  # compile + warm
    logdir = "/tmp/train_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(params, x))
    dt_step = (time.perf_counter() - t0) / ITERS
    jax.profiler.stop_trace()
    print(f"train fwd+bwd step b{b} {res}^2 remat: {dt_step*1e3:.3f} ms")
    report(logdir, ITERS)


if __name__ == "__main__":
    main_full() if os.environ.get("TP_FULL", "0") != "0" else main()
