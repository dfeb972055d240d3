"""Benchmarks for the BASELINE.json configs on one TPU chip.

Default (what the driver runs): config 1 — SD 1.5 txt2img, 512x512, DDIM-50,
CFG 7.5, batch 1, end-to-end (text encode -> scan denoise -> VAE decode) as a
single device program, bf16, full-size random-init models (perf is
weight-independent).  Prints a JSON line
{"metric", "value", "unit", "vs_baseline"}; vs_baseline = measured / the
1.5 img/s/chip north-star target (the reference publishes no numbers —
BASELINE.md).

With BENCH_SERVING_EXTRA (the default for the headline config) the
successful path prints TWO JSON lines: the exact-path headline first, then a
combined record that repeats the headline fields plus serving_approx_*
fields for the APPROXIMATE deployed config (b4 W8A8 + DeepCache k=2 — NOT
the north-star config, which is exact b1).  Tail line wins: consumers should
parse the LAST line (BASELINE.md documents the convention).

Other BASELINE configs via BENCH_CONFIG:
  sd15_txt2img (default) | sd15_img2img | sd21_txt2img_768 |
  one_step_b32 | train_step
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# Previous-round numbers (BASELINE.md "Measured (round 2)" table): every
# non-headline config reports vs_baseline against its OWN previous-round
# number, so the ratio means "speedup over last round".  UPDATE THESE from
# BASELINE.md when a round's final sweep is recorded there.  The headline
# sd15_txt2img config keeps the 1.5 img/s/chip north-star target as its
# denominator (BASELINE.json).
NORTH_STAR_IMG_S = 1.5
PREV_ROUND = {
    "sd15_img2img": 1.458,     # img/s, BASELINE.md round-3 config 2
    "sd21_txt2img_768": 0.404, # img/s, round-3 config 3
    "one_step_b32": 28.65,     # img/s, round-3 config 5 (pipelined)
    "train_step": 5.564,       # steps/s, round-3 config 4 (remat off)
    "serving_extra": 1.644,    # img/s, round-3 b4 W8A8-full + DeepCache k=2
}


def _zeros_like_tree(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build_pipeline(sd_version="1.5", dtype=jnp.bfloat16, int8=""):
    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m
    from stable_diffusion_tpu.pipeline import StableDiffusion

    if sd_version == "1.5":
        ucfg, tcfg = unet_m.UNetConfig.sd15(), clip_m.CLIPTextConfig.vit_l()
        pred = "epsilon"
    else:
        ucfg, tcfg = unet_m.UNetConfig.sd21(), clip_m.CLIPTextConfig.vit_h()
        pred = "v_prediction"
    vcfg = vae_m.VAEConfig()
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    # zeros with the real shapes (eval_shape, no RNG): perf-identical to
    # trained weights and avoids ~90 s of per-layer RNG kernels on the chip
    shapes = {
        "unet": jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dtype), k1),
        "text_encoder": jax.eval_shape(lambda k: clip_m.init_text_model(k, tcfg, dtype=dtype), k2),
        "vae": jax.eval_shape(lambda k: vae_m.init_vae(k, vcfg, dtype=dtype), k3),
    }
    params = _zeros_like_tree(shapes)
    if int8:
        # BENCH_INT8=1: weight-only int8 UNet linears.
        # BENCH_INT8=static: W8A8 linears — activations also int8 with static
        # scales (the MXU double-rate path); scale values don't affect perf.
        # BENCH_INT8=full: W8A8 linears AND resblock convs (Pallas int8
        # conv kernel: half the im2col DMA + double MXU rate).
        from stable_diffusion_tpu.utils.quantize_model import (
            attach_act_scales, quantize_convs, quantize_unet)

        params["unet"] = quantize_unet(params["unet"])
        if int8 == "static":
            params["unet"] = attach_act_scales(params["unet"])
        elif int8 == "full":
            params["unet"] = quantize_convs(params["unet"])
            params["unet"] = attach_act_scales(params["unet"], convs=True)
    params = jax.device_put(params)
    return StableDiffusion(
        params=params, unet_config=ucfg, text_config=tcfg, vae_config=vcfg,
        scheduler_config={"num_train_timesteps": 1000, "beta_start": 0.00085,
                          "beta_end": 0.012, "prediction_type": pred},
        dtype=dtype, impl="auto", sd_version=sd_version,
    )


def _timed(run, repeats):
    run(0)  # warmup + compile
    t0 = time.perf_counter()
    for i in range(repeats):
        out = run(i + 1)
    dt = (time.perf_counter() - t0) / repeats
    assert np.all(np.isfinite(out))
    return dt


def bench_sd15_txt2img(repeats, steps=50, batch=1, int8=None, deepcache=None):
    if int8 is None:
        int8 = os.environ.get("BENCH_INT8", "")
    pipe = build_pipeline("1.5", int8=int8)
    cond = np.zeros((batch, 77), np.int64)
    unc = np.ones((batch, 77), np.int64)
    # BENCH_DEEPCACHE=k enables the (approximate) DeepCache block-caching
    # mode; the headline metric stays exact (k=1)
    if deepcache is None:
        deepcache = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    # batch > 1 is the serving-throughput mode: steady-state pipelined
    # dispatch (fetch of batch k overlaps compute of batch k+1).  The
    # headline b1 config stays sequential dispatch-then-fetch (latency
    # semantics).  BENCH_PIPELINED overrides either default.
    pipelined = os.environ.get("BENCH_PIPELINED", "1" if batch > 1 else "0") != "0"

    def run(seed):
        return pipe.generate(
            prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=steps,
            sampler="ddim", img_size=(512, 512), batch_size=batch,
            cond_ids=cond, uncond_ids=unc, seed=seed,
            deepcache_interval=deepcache, output_dtype="uint8",
            device_output=pipelined,
        )

    dt = _timed_pipelined(run, repeats) if pipelined else _timed(run, repeats)
    return {
        "metric": "sd15 txt2img 512x512 DDIM-50 CFG7.5 imgs/sec/chip",
        "value": round(batch / dt, 4),
        "unit": "img/s",
        "vs_baseline": round(batch / dt / NORTH_STAR_IMG_S, 4),
    }


def bench_sd15_img2img(repeats):
    """BASELINE config 2: strength-scheduled DDPM, cosine schedule, batch 4."""
    # BENCH_INT8 / BENCH_DEEPCACHE compose here like config 1 (quantization
    # attaches to the shared UNet params; the exact path stays the headline)
    pipe = build_pipeline("1.5", int8=os.environ.get("BENCH_INT8", ""))
    deepcache = int(os.environ.get("BENCH_DEEPCACHE", "1"))
    batch = 4
    cond = np.zeros((batch, 77), np.int64)
    unc = np.ones((batch, 77), np.int64)
    lat = np.random.default_rng(0).standard_normal((batch, 64, 64, 4), np.float32)
    # batch-4 serving config: steady-state pipelined by default (see
    # bench_sd15_txt2img); BENCH_PIPELINED=0 restores sequential timing
    pipelined = os.environ.get("BENCH_PIPELINED", "1") != "0"

    def run(seed):
        return pipe.generate(
            prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=50,
            sampler="ddpm", use_cosine_schedule=True, strength=0.8,
            img_size=(512, 512), batch_size=batch, cond_ids=cond,
            uncond_ids=unc, seed=seed, input_latents=lat,
            deepcache_interval=deepcache,
            output_dtype="uint8", device_output=pipelined,
        )

    dt = _timed_pipelined(run, repeats) if pipelined else _timed(run, repeats)
    return {
        "metric": "sd15 img2img 512x512 DDPM-cosine s0.8 b4 imgs/sec/chip",
        "value": round(batch / dt, 4), "unit": "img/s",
        "vs_baseline": round(batch / dt / PREV_ROUND["sd15_img2img"], 4),
    }


def bench_sd21_txt2img_768(repeats):
    """BASELINE config 3: SD2.1, v-prediction, 768x768, DDIM 50.

    BENCH_DEEPCACHE=k / BENCH_INT8 compose like config 1 (the exact path
    stays the headline)."""
    pipe = build_pipeline("2.1", int8=os.environ.get("BENCH_INT8", ""))
    cond = np.zeros((1, 77), np.int64)
    unc = np.ones((1, 77), np.int64)
    deepcache = int(os.environ.get("BENCH_DEEPCACHE", "1"))

    def run(seed):
        return pipe.generate(
            prompt="", do_cfg=True, cfg_scale=7.5, inference_steps=50,
            sampler="ddim", img_size=(768, 768), batch_size=1,
            cond_ids=cond, uncond_ids=unc, seed=seed,
            deepcache_interval=deepcache, output_dtype="uint8",
        )

    dt = _timed(run, repeats)
    return {
        "metric": "sd21 txt2img 768x768 DDIM-50 v-pred imgs/sec/chip",
        "value": round(1 / dt, 4), "unit": "img/s",
        "vs_baseline": round(1 / dt / PREV_ROUND["sd21_txt2img_768"], 4),
    }


def _timed_pipelined(dispatch, repeats):
    """Steady-state serving throughput: dispatch batch k+1 BEFORE fetching
    batch k, so the host transfer of a finished batch overlaps the next
    batch's device compute.  ``dispatch`` must return an UNFETCHED jax.Array
    (pipeline device_output=True, lane-packed (b, h, w*3)).  Measured on
    config 5: the sequential NHWC fetch cost ~1.5 s per 25 MB uint8 batch on
    the axon relay; lane-packing cuts it 3.3x and pipelining overlaps most
    of the rest (benchmarks/probe_fetch_overlap.py, probe_fetch_shapes.py).
    copy_to_host_async at dispatch time lets the runtime start the D2H the
    instant compute finishes (round-4 probe: best of 5 schemes; deeper
    pipelining measured WORSE — see BASELINE.md round-4 transfer table)."""
    from stable_diffusion_tpu.pipeline import _unpack_images

    _unpack_images(dispatch(0))  # warmup + compile
    prev = dispatch(1)
    prev.copy_to_host_async()
    t0 = time.perf_counter()
    for i in range(repeats):
        cur = dispatch(i + 2)
        cur.copy_to_host_async()
        out = _unpack_images(prev)
        prev = cur
    dt = (time.perf_counter() - t0) / repeats
    _unpack_images(prev)
    assert np.all(np.isfinite(out.astype(np.float32)))
    return dt


def bench_one_step_b32(repeats):
    """BASELINE config 5: SwiftBrush one-step generation, batch 32.

    This is the explicit serving-throughput config (BASELINE.md), so the
    default measurement is the steady-state pipelined loop (next batch
    dispatched before the previous batch's host fetch).  BENCH_PIPELINED=0
    restores the round-2 sequential dispatch-then-fetch semantics."""
    pipe = build_pipeline("1.5")
    cond = np.zeros((1, 77), np.int64)
    pipelined = os.environ.get("BENCH_PIPELINED", "1") != "0"

    def run(seed):
        return pipe.generate_in_one_step(
            prompt="", img_size=(512, 512), batch_size=32, cond_ids=cond,
            seed=seed, output_dtype="uint8", device_output=pipelined,
        )

    dt = _timed_pipelined(run, repeats) if pipelined else _timed(run, repeats)
    return {
        "metric": "swiftbrush one-step 512x512 b32 imgs/sec/chip",
        "value": round(32 / dt, 4), "unit": "img/s",
        "vs_baseline": round(32 / dt / PREV_ROUND["one_step_b32"], 4),
    }


def bench_train_step(repeats):
    """BASELINE config 4: LoRA+DreamBooth train step (EMA, remat, accum)."""
    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T
    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m

    pipe = build_pipeline("1.5")
    # remat is a memory knob, not workload semantics: b4 512x512 fits v5e
    # HBM without it and runs +17% faster (round-3 A/B: 5.56 vs 4.83
    # steps/s), so the bench default is off; BENCH_TRAIN_REMAT=1 restores
    # the checkpointed step (required for bigger per-chip batches/meshes,
    # and still covered by tests/test_parallel_training.py).
    remat = os.environ.get("BENCH_TRAIN_REMAT", "0") != "0"
    cfg = T.TrainConfig(rank=128, alpha=128.0, use_ema=True,
                        gradient_checkpointing=remat, grad_accum_steps=2,
                        lora_targets=("q_proj", "k_proj", "v_proj", "out_proj"))
    schedule = S.make_schedule()
    state = T.init_train_state(jax.random.key(0), pipe.params, cfg)
    step_fn = jax.jit(T.make_train_step(
        pipe.params, ucfg=pipe.unet_config, tcfg=pipe.text_config,
        vcfg=pipe.vae_config, schedule=schedule, train_cfg=cfg,
    ))
    b = 4  # 2 instance + 2 prior
    img = jax.random.normal(jax.random.key(1), (b, 512, 512, 3), jnp.bfloat16)
    t, noise, vnoise = T.sample_batch_noise(jax.random.key(2), img)
    batch = {"images": img, "input_ids": jnp.zeros((b, 77), jnp.int32),
             "t": t, "noise": noise.astype(jnp.bfloat16),
             "vae_noise": vnoise.astype(jnp.bfloat16)}

    state, m = step_fn(state, batch)  # compile
    _ = np.asarray(m["loss"])
    # a train step is ~180 ms — BENCH_REPEATS=3 (the e2e-config default)
    # times only ~0.5 s and is relay-noise-dominated (round 3/4 runs moved
    # +-5% on identical code); floor at 20 steps for a stable number
    repeats = max(repeats, 20)
    t0 = time.perf_counter()
    for _ in range(repeats):
        state, m = step_fn(state, batch)
    _ = np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / repeats
    return {
        "metric": "dreambooth-lora train step b4 512x512 steps/sec/chip",
        "value": round(1 / dt, 4), "unit": "steps/s",
        "vs_baseline": round(1 / dt / PREV_ROUND["train_step"], 4),
    }


CONFIGS = {
    "sd15_txt2img": bench_sd15_txt2img,
    "sd15_img2img": bench_sd15_img2img,
    "sd21_txt2img_768": bench_sd21_txt2img_768,
    "one_step_b32": bench_one_step_b32,
    "train_step": bench_train_step,
}


def bench_breakdown(repeats):
    """Reproducible step-time breakdown (BASELINE.md's table, as a command):
    BENCH_CONFIG=breakdown — times text-encode / denoise-scan / VAE-decode
    separately via SectionTimer (forced fetch: block_until_ready does not
    block on remote transports).  JSON value = e2e sum in img/s."""
    import stable_diffusion_tpu.pipeline as P
    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu.utils.profiling import SectionTimer

    pipe = build_pipeline("1.5")
    cond = jnp.zeros((1, 77), jnp.int32)
    unc = jnp.ones((1, 77), jnp.int32)
    schedule = pipe.make_schedule()
    ts = S.inference_timesteps(schedule, 50, kind="ddim")
    prev_ts = ts - schedule.num_train_timesteps // 50
    table = jnp.asarray(schedule.alphas_hat)
    timer = SectionTimer()

    def once(timer, seed):
        with timer.section("text_encode") as out:
            ctx = P._encode_text_jit(
                pipe.params["text_encoder"],
                jnp.concatenate([unc, cond]), pipe.text_config, pipe.dtype, pipe.impl)
            out["sync"] = ctx
        lat0 = jax.random.normal(jax.random.key(seed), (1, 64, 64, 4), pipe.dtype)
        with timer.section("denoise_scan_50") as out:
            lat = P._denoise_jit(
                pipe.params["unet"], lat0, ctx.astype(pipe.dtype),
                jnp.asarray(ts), jnp.asarray(prev_ts), table,
                jnp.asarray(7.5, jnp.float32), jax.random.key(seed),
                pipe.unet_config, True, "ddim", "epsilon", 0.0, pipe.impl)
            out["sync"] = lat
        with timer.section("vae_decode") as out:
            img = P._decode_jit(pipe.params["vae"], lat, pipe.vae_config, pipe.impl)
            out["sync"] = img
        return img

    once(SectionTimer(), 0)  # warmup/compile (not counted)
    for i in range(repeats):
        out = once(timer, i + 1)
    assert np.all(np.isfinite(np.asarray(out)))
    print(timer.report(), file=sys.stderr)
    total = sum(timer.sections.values()) / repeats
    return {
        "metric": "sd15 txt2img 512x512 modular-stage breakdown e2e imgs/sec/chip",
        "value": round(1 / total, 4), "unit": "img/s",
        "vs_baseline": round(1 / total / NORTH_STAR_IMG_S, 4),
        "breakdown_ms": {k: round(v / repeats * 1000, 1) for k, v in timer.sections.items()},
    }


def main():
    from stable_diffusion_tpu.utils.profiling import trace

    name = os.environ.get("BENCH_CONFIG", "sd15_txt2img")
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # BENCH_PROFILE_DIR=<dir>: capture a TensorBoard/XLA trace of the run
    with trace(os.environ.get("BENCH_PROFILE_DIR")):
        if name == "sd15_txt2img":
            steps = int(os.environ.get("BENCH_STEPS", "50"))
            batch = int(os.environ.get("BENCH_BATCH", "1"))
            result = bench_sd15_txt2img(repeats, steps=steps, batch=batch)
            # The driver records only this default invocation, so ALSO measure
            # the deployed serving config: batch 4, calibrated-W8A8
            # linears+convs, DeepCache k=2 (image-|d| p99 0.064 — quality
            # table in BASELINE.md), steady-state pipelined dispatch.  That
            # config is APPROXIMATE (int8 + block caching), so it is NOT the
            # north-star metric (exact b1, which `vs_baseline` above tracks
            # and which remains below target on this silicon — see the
            # exact-path floor table in BASELINE.md); its fields are labeled
            # serving_approx_* and its ratio is vs the PREVIOUS ROUND's
            # serving number, not the north star.  The headline line is
            # printed FIRST so a harness timeout mid-serving still leaves a
            # parseable record; on success a combined line (headline +
            # serving_approx_* fields) is printed last and wins tail
            # parsing.  BENCH_SERVING_EXTRA=0 skips (~7 min: int8 rewrite of
            # the params on host + the b4 DeepCache program compile).
            if (batch == 1 and steps == 50
                    and not os.environ.get("BENCH_INT8")
                    and not os.environ.get("BENCH_DEEPCACHE")
                    and os.environ.get("BENCH_SERVING_EXTRA", "1") != "0"):
                print(json.dumps(result), flush=True)
                try:
                    srv = bench_sd15_txt2img(
                        repeats, steps=50, batch=4, int8="full", deepcache=2)
                    result["serving_approx_config"] = (
                        "b4 W8A8-full + DeepCache k=2, pipelined — "
                        "approximate mode (quality: image-|d| p99 0.064 on "
                        "random-init weights, BASELINE.md)")
                    result["serving_approx_img_s"] = srv["value"]
                    result["serving_approx_vs_prev_round"] = round(
                        srv["value"] / PREV_ROUND["serving_extra"], 4)
                except Exception as e:  # never fail the headline metric
                    result["serving_error"] = repr(e)[:200]
        elif name == "breakdown":
            result = bench_breakdown(repeats)
        else:
            result = CONFIGS[name](repeats)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
