"""Benchmarks for the BASELINE.json configs on one TPU chip.

Default (what the driver runs): EVERY BASELINE config in one process —
1. SD 1.5 txt2img 512², DDIM-50, CFG 7.5, b1 — the exact-path HEADLINE:
   end-to-end (text encode -> scan denoise -> VAE decode) as one device
   program, bf16, full-size random-init models (perf is weight-independent).
   `value`/`vs_baseline` = this config vs the 1.5 img/s/chip north star
   (the reference publishes no numbers — BASELINE.md).
2. train step b4 512² (cached frozen encoders — the trainer CLI default),
3. SwiftBrush one-step b32 (pipelined serving),
4. img2img b4 DDPM-cosine, 5. SD2.1 768² v-pred,
6. the approximate deployed serving config (b4 W8A8-full + DeepCache k=2).
Each extra config's fields land in the combined record as
{tag}_value/{tag}_unit/{tag}_vs_prev_round/{tag}_spread_pct, and the record
is RE-PRINTED after each config so a harness timeout leaves the most
complete parseable line in the tail.  Tail line wins: consumers parse the
LAST line (BASELINE.md documents the convention).  Throughput configs time
BENCH_BLOCKS(=3) independent blocks and report the median + min-max spread.

BENCH_ALL=0 -> headline only.  One config alone via BENCH_CONFIG:
  sd15_txt2img | sd15_img2img | sd21_txt2img_768 | one_step_b32 |
  train_step | breakdown
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
    "sd15_img2img": 1.498,     # img/s, BASELINE.md round-4 config 2
    "sd21_txt2img_768": 0.399, # img/s, round-4 config 3
    "one_step_b32": 31.76,     # img/s, round-4 config 5 (pipelined)
    "train_step": 6.084,       # steps/s, round-4 config 4 (remat off,
                               # uncached: frozen encoders ran every step)
    "serving_extra": 1.648,    # img/s, round-4 b4 W8A8-full + DeepCache k=2
}

# Run-to-run noise protocol (BASELINE.md round-5): every throughput config
# repeats its timed block BENCH_BLOCKS times in one process and reports the
# MEDIAN, with the min-max spread carried in the JSON ("spread_pct") so a
# round-over-round delta can be judged against measured noise instead of
# guessed at (the r3->r4 serving field moved -0.8% on identical code).
BENCH_BLOCKS = int(os.environ.get("BENCH_BLOCKS", "3"))


def _robust(run, repeats, pipelined, blocks=None):
    """Median-of-blocks timing: returns (dt_median, spread_frac).  Per-block
    times go to stderr so a relay stall (observed: one ~60 s hiccup in an
    otherwise 4.8 s/block run) is diagnosable from the log.  ``blocks``
    overrides BENCH_BLOCKS for configs whose blocks are cheap enough that
    extra medians are nearly free."""
    f = _timed_pipelined if pipelined else _timed
    # warmup/compile happens once (block 1); later blocks skip it — the
    # warmup run is untimed, so medians are unaffected, but each skipped
    # warmup saves a full untimed batch (~2.5 s at serving batch)
    dts = sorted(f(run, repeats, warm=b > 0)
                 for b in range(blocks or BENCH_BLOCKS))
    print(f"_robust blocks (s): {[round(d, 3) for d in dts]}", file=sys.stderr)
    med = dts[len(dts) // 2]
    return med, (dts[-1] - dts[0]) / med if len(dts) > 1 else 0.0


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


def _timed(run, repeats, warm=False):
    if not warm:
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

    dt, spread = _robust(run, repeats, pipelined)
    return {
        "metric": "sd15 txt2img 512x512 DDIM-50 CFG7.5 imgs/sec/chip",
        "value": round(batch / dt, 4),
        "unit": "img/s",
        "vs_baseline": round(batch / dt / NORTH_STAR_IMG_S, 4),
        "spread_pct": round(100 * spread, 1),
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

    dt, spread = _robust(run, repeats, pipelined)
    return {
        "metric": "sd15 img2img 512x512 DDPM-cosine s0.8 b4 imgs/sec/chip",
        "value": round(batch / dt, 4), "unit": "img/s",
        "vs_baseline": round(batch / dt / PREV_ROUND["sd15_img2img"], 4),
        "spread_pct": round(100 * spread, 1),
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

    dt, spread = _robust(run, repeats, pipelined=False)
    return {
        "metric": "sd21 txt2img 768x768 DDIM-50 v-pred imgs/sec/chip",
        "value": round(1 / dt, 4), "unit": "img/s",
        "vs_baseline": round(1 / dt / PREV_ROUND["sd21_txt2img_768"], 4),
        "spread_pct": round(100 * spread, 1),
    }


def _timed_pipelined(dispatch, repeats, warm=False):
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

    if not warm:
        _unpack_images(dispatch(0))  # warmup + compile
    prev = dispatch(1)  # priming batch: every block needs a primed pipeline
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

    # This config is TRANSPORT-bound (~1 s/batch: 29.5 img/s steady state vs
    # the 31.9 device ceiling, BASELINE.md round-4 table) and the relay's
    # throughput swings on multi-second scales (round-5 measured the same
    # code at 25.7/29.5/30.1 img/s across runs minutes apart, block spreads
    # up to 52%).  A 3x3 protocol SAMPLES those windows; 8-batch blocks
    # AVERAGE over them and a 5-block median rejects the outliers.  Blocks
    # here cost ~1 s/batch — the stability is nearly free.
    dt, spread = _robust(run, max(repeats, 8), pipelined,
                         blocks=max(BENCH_BLOCKS, 5))
    return {
        "metric": "swiftbrush one-step 512x512 b32 imgs/sec/chip",
        "value": round(32 / dt, 4), "unit": "img/s",
        "vs_baseline": round(32 / dt / PREV_ROUND["one_step_b32"], 4),
        "spread_pct": round(100 * spread, 1),
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
    # The DEFAULT is the trainer CLI's default: cached frozen encoders
    # (--cache_latents).  The frozen VAE moments and text embeddings are
    # per-image/per-prompt CONSTANTS (training.py precompute_latent_moments),
    # so the steady-state step carries them as inputs instead of re-running
    # the 50+ ms encode every step like the reference does
    # (train_lora_dreambooth.py:76-88).  BENCH_TRAIN_CACHED=0 restores the
    # re-encode-every-step semantics for comparison.  The one-time cache
    # build is amortized over max_train_steps (>=1000 in both repos) and is
    # excluded, exactly as compile time is.
    cached = os.environ.get("BENCH_TRAIN_CACHED", "1") != "0"
    t, noise, vnoise = T.sample_noise_for_latents(jax.random.key(2), (b, 64, 64, 4))
    batch = {"t": t, "noise": noise.astype(jnp.bfloat16),
             "vae_noise": vnoise.astype(jnp.bfloat16)}
    if cached:
        k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
        batch["latent_mean"] = jax.random.normal(k1, (b, 64, 64, 4), jnp.bfloat16)
        batch["latent_std"] = jax.nn.softplus(
            jax.random.normal(k2, (b, 64, 64, 4), jnp.bfloat16))
        batch["text_emb"] = jax.random.normal(
            k3, (b, 77, pipe.text_config.hidden_size), jnp.bfloat16)
    else:
        batch["images"] = jax.random.normal(
            jax.random.key(1), (b, 512, 512, 3), jnp.bfloat16)
        batch["input_ids"] = jnp.zeros((b, 77), jnp.int32)

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
    label = "cached-enc" if cached else "reencode"
    return {
        "metric": f"dreambooth-lora train step b4 512x512 ({label}) steps/sec/chip",
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

    name = os.environ.get("BENCH_CONFIG", "")
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # BENCH_PROFILE_DIR=<dir>: capture a TensorBoard/XLA trace of the run
    with trace(os.environ.get("BENCH_PROFILE_DIR")):
        if name in ("", "all", "sd15_txt2img"):
            steps = int(os.environ.get("BENCH_STEPS", "50"))
            batch = int(os.environ.get("BENCH_BATCH", "1"))
            result = bench_sd15_txt2img(repeats, steps=steps, batch=batch)
            # Default (the driver's invocation): after the exact-path
            # headline, measure EVERY BASELINE.md config — train step,
            # one-step b32, img2img b4, SD2.1 768² — plus the deployed
            # approximate serving config (b4 calibrated-W8A8 linears+convs +
            # DeepCache k=2, pipelined; image-|d| p99 0.064 on random-init
            # weights — quality table in BASELINE.md).  The serving config is
            # APPROXIMATE, so it is NOT the north-star metric (exact b1,
            # which `vs_baseline` tracks); its ratio and every other
            # config's `*_vs_prev_round` are vs the PREVIOUS ROUND's number
            # (PREV_ROUND above).  A combined record accumulates the fields
            # and is re-printed after each config completes, so a harness
            # timeout at any point leaves the most complete parseable line
            # in the tail (tail line wins — BASELINE.md documents the
            # convention).  BENCH_ALL=0 restores the headline-only run;
            # BENCH_SERVING_EXTRA=0 skips the ~7-min serving config.
            customized = (batch != 1 or steps != 50
                          or bool(os.environ.get("BENCH_INT8"))
                          or bool(os.environ.get("BENCH_DEEPCACHE")))
            # an EXPLICIT BENCH_CONFIG=sd15_txt2img means this config alone
            # (docstring contract) — only ""/"all" fan out to the extras
            if (name in ("", "all") and not customized
                    and os.environ.get("BENCH_ALL", "1") != "0"):
                print(json.dumps(result), flush=True)
                extras = [
                    ("train", bench_train_step),
                    ("one_step_b32", bench_one_step_b32),
                    ("img2img_b4", bench_sd15_img2img),
                    ("sd21_768", bench_sd21_txt2img_768),
                ]
                if os.environ.get("BENCH_SERVING_EXTRA", "1") != "0":
                    extras.append(("serving_approx", lambda r: bench_sd15_txt2img(
                        r, steps=50, batch=4, int8="full", deepcache=2)))
                for tag, fn in extras:
                    try:
                        r = fn(repeats)
                        result[f"{tag}_metric"] = r["metric"]
                        result[f"{tag}_value"] = r["value"]
                        result[f"{tag}_unit"] = r["unit"]
                        result[f"{tag}_vs_prev_round"] = (
                            round(r["value"] / PREV_ROUND["serving_extra"], 4)
                            if tag == "serving_approx" else r["vs_baseline"])
                        if "spread_pct" in r:
                            result[f"{tag}_spread_pct"] = r["spread_pct"]
                    except Exception as e:  # never fail the headline metric
                        result[f"{tag}_error"] = repr(e)[:200]
                    print(json.dumps(result), flush=True)
                if "serving_approx_value" in result:
                    result["serving_approx_config"] = (
                        "b4 W8A8-full + DeepCache k=2, pipelined — approximate "
                        "mode (quality: image-|d| p99 0.064 on random-init "
                        "weights, BASELINE.md)")
        elif name == "breakdown":
            result = bench_breakdown(repeats)
        else:
            result = CONFIGS[name](repeats)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
