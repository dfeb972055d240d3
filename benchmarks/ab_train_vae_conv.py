"""A/B: route the frozen VAE-encoder large-spatial convs through the Pallas
conv kernel at TRAIN batch (4) vs the XLA spatial conv (round-3 envelope).

Motivation (round-4 full-train-step profile, profile_train.py TP_FULL=1):
the b4 512^2 train step spends ~54 ms of 164.7 in copy/bitcast relayout
fusions around the XLA VAE-encoder convs (T(8,128)<->T(4,128) churn at
512^2x128 / 256^2x256 / 128^2x512) while the convs themselves cost ~6 ms —
the decode-side "pathological layout" effect (BASELINE.md round 3) showing
up in the training program.  The inference-decode A/B favored XLA at b>=4,
so the envelope cap cannot be raised globally; this measures the TRAIN
program specifically.

Run on chip: python benchmarks/ab_train_vae_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def build_step():
    from bench import build_pipeline
    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T

    pipe = build_pipeline("1.5")
    cfg = T.TrainConfig(rank=128, alpha=128.0, use_ema=True,
                        gradient_checkpointing=False, grad_accum_steps=2,
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
    return step_fn, state, batch


def timed(step_fn, state, batch):
    state, m = step_fn(state, batch)
    _ = np.asarray(m["loss"])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        state, m = step_fn(state, batch)
    loss = np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / REPS
    return dt, float(loss)


def build_step_no_vae():
    """Same step with the VAE encode bypassed (latents fed directly):
    isolates the frozen encoder's IN-PROGRAM cost incl. its layout churn."""
    from bench import build_pipeline
    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T
    from stable_diffusion_tpu.models import vae as vae_m

    pipe = build_pipeline("1.5")
    cfg = T.TrainConfig(rank=128, alpha=128.0, use_ema=True,
                        gradient_checkpointing=False, grad_accum_steps=2,
                        lora_targets=("q_proj", "k_proj", "v_proj", "out_proj"))
    schedule = S.make_schedule()
    state = T.init_train_state(jax.random.key(0), pipe.params, cfg)
    orig_encode = vae_m.encode
    b = 4
    lat = jax.random.normal(jax.random.key(9), (b, 64, 64, 4), jnp.bfloat16)
    try:
        vae_m.encode = lambda p, x, c, noise=None, impl="auto": (lat, None, None)
        step_fn = jax.jit(T.make_train_step(
            pipe.params, ucfg=pipe.unet_config, tcfg=pipe.text_config,
            vcfg=pipe.vae_config, schedule=schedule, train_cfg=cfg))
        img = jax.random.normal(jax.random.key(1), (b, 512, 512, 3), jnp.bfloat16)
        t, noise, vnoise = T.sample_batch_noise(jax.random.key(2), img)
        batch = {"images": img, "input_ids": jnp.zeros((b, 77), jnp.int32),
                 "t": t, "noise": noise.astype(jnp.bfloat16),
                 "vae_noise": vnoise.astype(jnp.bfloat16)}
        state, m = step_fn(state, batch)  # trace happens here
        _ = np.asarray(m["loss"])
    finally:
        vae_m.encode = orig_encode
    return step_fn, state, batch


def main():
    from stable_diffusion_tpu.ops import conv as conv_ops

    print(f"backend={jax.default_backend()}")
    if os.environ.get("AB_ONLY", "") != "novae":
        for cap in (2, 4):
            conv_ops.LARGE_MAX_BATCH = cap
            step_fn, state, batch = build_step()
            dt, loss = timed(step_fn, state, batch)
            print(f"LARGE_MAX_BATCH={cap}: {dt*1e3:8.2f} ms/step "
                  f"({1/dt:6.3f} steps/s)  loss={loss:.5f}", flush=True)
    if os.environ.get("AB_PARTIAL", "") == "1":
        # partial raise: Pallas convs at b4 only for <= 256^2 spatial (the
        # 512^2 shapes — where the kernel's width-im2col build is furthest
        # from XLA — stay XLA).  Probes whether the all-or-nothing cap=4
        # LOSS was dominated by the 512^2 shapes.
        conv_ops.LARGE_MAX_BATCH = 4
        conv_ops.LARGE_MAX_AREA = 256 * 256
        step_fn, state, batch = build_step()
        dt, loss = timed(step_fn, state, batch)
        print(f"partial (<=256^2 @ b4): {dt*1e3:8.2f} ms/step "
              f"({1/dt:6.3f} steps/s)  loss={loss:.5f}", flush=True)
        conv_ops.LARGE_MAX_AREA = 768 * 768
    if os.environ.get("AB_NOVAE", "1") == "1":
        conv_ops.LARGE_MAX_BATCH = 2
        step_fn, state, batch = build_step_no_vae()
        dt, loss = timed(step_fn, state, batch)
        print(f"no-VAE-encode:      {dt*1e3:8.2f} ms/step "
              f"({1/dt:6.3f} steps/s)  loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main()
