"""Benchmark: SD 1.5 txt2img, 512x512, DDIM-50, CFG 7.5, batch 1 (BASELINE.json
config 1) on one TPU chip, end-to-end (text encode -> scan denoise -> VAE
decode), bf16 weights/activations, random-initialized full-size models (perf
is weight-independent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured imgs/sec divided by the 1.5 img/s/chip north-star
target (the reference publishes no numbers — BASELINE.md)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def build_pipeline(dtype=jnp.bfloat16):
    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m
    from stable_diffusion_tpu.pipeline import StableDiffusion

    ucfg = unet_m.UNetConfig.sd15()
    tcfg = clip_m.CLIPTextConfig.vit_l()
    vcfg = vae_m.VAEConfig()
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    # zeros with the real shapes (eval_shape, no RNG): perf-identical to
    # trained weights and avoids ~90 s of per-layer RNG kernels on the chip
    shapes = {
        "unet": jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dtype), k1),
        "text_encoder": jax.eval_shape(lambda k: clip_m.init_text_model(k, tcfg, dtype=dtype), k2),
        "vae": jax.eval_shape(lambda k: vae_m.init_vae(k, vcfg, dtype=dtype), k3),
    }
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = jax.device_put(params)
    return StableDiffusion(
        params=params, unet_config=ucfg, text_config=tcfg, vae_config=vcfg,
        dtype=dtype, impl="auto", sd_version="1.5",
    )


def main():
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    pipe = build_pipeline()
    cond_ids = np.zeros((batch, 77), np.int64)
    uncond_ids = np.ones((batch, 77), np.int64)

    def run(seed):
        return pipe.generate(
            prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=steps,
            sampler="ddim", img_size=(512, 512), batch_size=batch,
            cond_ids=cond_ids, uncond_ids=uncond_ids, seed=seed,
        )

    run(0)  # warmup + compile
    t0 = time.perf_counter()
    for i in range(repeats):
        imgs = run(i + 1)
    dt = (time.perf_counter() - t0) / repeats
    assert np.all(np.isfinite(imgs))

    imgs_per_sec = batch / dt
    print(
        json.dumps(
            {
                "metric": "sd15 txt2img 512x512 DDIM-50 CFG7.5 imgs/sec/chip",
                "value": round(imgs_per_sec, 4),
                "unit": "img/s",
                "vs_baseline": round(imgs_per_sec / 1.5, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
