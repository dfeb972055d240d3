"""Quality accounting for the approximate / quantized serving modes.

Measures, at FULL SD1.5 topology with deterministic random-init weights
(fixed seed, real init distributions), the end-to-end 50-step deviation of
every opt-in speed mode against the exact bf16 path:

  * int8-w    — weight-only int8 UNet linears
  * w8a8      — static W8A8 linears, activation scales CALIBRATED (eager
                sweep over latent/timestep batches, the realized form of the
                reference's prepare/convert skeleton quantize_model.py:21-34)
  * w8a8-full — W8A8 linears AND resblock convs (Pallas int8 conv kernel)
  * deepcache k=2 / k=3 — UNet trunk caching (arXiv 2312.03209)

Reported per mode: final-latent MSE (absolute and relative to the exact
final-latent variance), decoded-image MSE, and abs-diff percentiles
(50/90/99/max) over the image.  The analog of the reference's evaluation
harness intent (evaluation.py:96-107) runnable without real weights — with
real checkpoints the same script quantifies production quality.

Run on chip:  python benchmarks/quality_deltas.py        (~10 min)
Results are recorded in BASELINE.md (round-3 quality table).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import clip as clip_m
from stable_diffusion_tpu.models import unet as unet_m
from stable_diffusion_tpu.models import vae as vae_m
from stable_diffusion_tpu.pipeline import StableDiffusion
from stable_diffusion_tpu.utils import quantize_model as QM

STEPS = int(os.environ.get("QD_STEPS", "50"))
SEED = 7


def build_params(dtype=jnp.bfloat16):
    """Real init distributions (kaiming etc.) so activation magnitudes are
    representative; fixed seed so every mode sees identical weights."""
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    ucfg, tcfg, vcfg = (
        unet_m.UNetConfig.sd15(), clip_m.CLIPTextConfig.vit_l(), vae_m.VAEConfig()
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = {
            "unet": unet_m.init_unet(k1, ucfg, dtype=dtype),
            "text_encoder": clip_m.init_text_model(k2, tcfg, dtype=dtype),
            "vae": vae_m.init_vae(k3, vcfg, dtype=dtype),
        }
    return params, ucfg, tcfg, vcfg


def make_pipe(params, ucfg, tcfg, vcfg):
    return StableDiffusion(
        params=jax.device_put(params), unet_config=ucfg, text_config=tcfg,
        vae_config=vcfg,
        scheduler_config={"num_train_timesteps": 1000, "beta_start": 0.00085,
                          "beta_end": 0.012, "prediction_type": "epsilon"},
        dtype=jnp.bfloat16, impl="auto", sd_version="1.5",
    )


def run_mode(pipe, cond, unc, deepcache=1):
    img = pipe.generate(
        prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=STEPS,
        sampler="ddim", img_size=(512, 512), batch_size=1, cond_ids=cond,
        uncond_ids=unc, seed=SEED, deepcache_interval=deepcache,
    )
    lat = pipe.generate(
        prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=STEPS,
        sampler="ddim", img_size=(512, 512), batch_size=1, cond_ids=cond,
        uncond_ids=unc, seed=SEED, deepcache_interval=deepcache,
        return_latents=True,
    )
    return np.asarray(lat, np.float64), np.asarray(img, np.float64)


def calibrate_unet(params, ucfg, tcfg):
    """Eager calibration sweep on CPU (avoids per-op relay round-trips):
    latents at several noise levels x the deterministic text context."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ctx = clip_m.text_model_apply(
            params["text_encoder"], jnp.zeros((2, 77), jnp.int32),
            tcfg, impl="xla", dtype=jnp.bfloat16,
        )
        batches = []
        for i, t in enumerate((999, 100)):
            x = jax.random.normal(jax.random.key(10 + i), (2, 64, 64, 4), jnp.bfloat16)
            batches.append((x, jnp.asarray([t], jnp.int32), ctx))

        apply = lambda p, b: unet_m.unet_apply(p, b[0], b[1], b[2], ucfg, impl="xla")
        cal = QM.calibrate_static_activations(apply, params["unet"], batches)
        cal = QM.calibrate_static_conv_activations(
            lambda p, b: unet_m.unet_apply(p, b[0], b[1], b[2], ucfg, impl="xla"),
            cal, batches,
        )
    return cal


def stats(name, lat, img, lat0, img0):
    lmse = float(np.mean((lat - lat0) ** 2))
    rel = lmse / float(np.var(lat0) + 1e-12)
    imse = float(np.mean((img - img0) ** 2))
    d = np.abs(img - img0).ravel()
    pct = np.percentile(d, [50, 90, 99, 100])
    print(
        f"{name:14s} latMSE={lmse:.3e} rel={rel:.3e} imgMSE={imse:.3e} "
        f"|d| p50={pct[0]:.4f} p90={pct[1]:.4f} p99={pct[2]:.4f} max={pct[3]:.4f}",
        flush=True,
    )
    return {"latent_mse": lmse, "latent_rel": rel, "img_mse": imse}


def main():
    modes = os.environ.get("QD_MODES", "deepcache,int8").split(",")
    print(f"backend={jax.default_backend()} steps={STEPS} modes={modes}", flush=True)
    params, ucfg, tcfg, vcfg = build_params()
    cond = np.zeros((1, 77), np.int64)
    unc = np.ones((1, 77), np.int64)

    t0 = time.time()
    pipe = make_pipe(params, ucfg, tcfg, vcfg)
    lat0, img0 = run_mode(pipe, cond, unc)
    print(f"exact path done ({time.time()-t0:.0f}s) "
          f"lat var={np.var(lat0):.4f} img mean={img0.mean():.4f}", flush=True)

    if "deepcache" in modes:
        for k in (2, 3):
            lat, img = run_mode(pipe, cond, unc, deepcache=k)
            stats(f"deepcache k={k}", lat, img, lat0, img0)

    if "int8" in modes:
        p = dict(params)
        p["unet"] = QM.quantize_unet(params["unet"])
        lat, img = run_mode(make_pipe(p, ucfg, tcfg, vcfg), cond, unc)
        stats("int8-w", lat, img, lat0, img0)

        t0 = time.time()
        cal = calibrate_unet(params, ucfg, tcfg)
        print(f"calibration sweep done ({time.time()-t0:.0f}s)", flush=True)

        p = dict(params)
        p["unet"] = QM.quantize_params(cal)
        lat, img = run_mode(make_pipe(p, ucfg, tcfg, vcfg), cond, unc)
        stats("w8a8-linears", lat, img, lat0, img0)

        p = dict(params)
        p["unet"] = QM.quantize_convs(QM.quantize_params(cal))
        pq = make_pipe(p, ucfg, tcfg, vcfg)
        lat, img = run_mode(pq, cond, unc)
        stats("w8a8-full", lat, img, lat0, img0)

        # the composed serving mode (the >= 1.5 img/s configuration:
        # W8A8-full + DeepCache) — its quality delta must be accounted
        # against the exact path, not assumed additive
        for k in (2, 3):
            lat, img = run_mode(pq, cond, unc, deepcache=k)
            stats(f"w8a8-full+dc k={k}", lat, img, lat0, img0)


if __name__ == "__main__":
    main()
