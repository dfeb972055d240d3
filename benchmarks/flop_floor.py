"""Analytic FLOP/byte floor for the UNet CFG denoise step (VERDICT r2 item 1).

Walks the jaxpr of the pure-XLA UNet forward (impl="xla" so every matmul and
conv is a visible primitive, not a Pallas custom call) and classifies each
``dot_general`` / ``conv_general_dilated`` into the step's op classes:

  * attn-qk/pv   — the s x s attention dots.  SD1.5's d=40 heads force <=50%
    MXU lane utilization whether padded to 64 or not (BASELINE.md round-3
    "attention d40->64 padding"), so their floor rate is 95 TF/s, not 190.
  * projections  — QKV/out/1x1-conv matmuls (floor: 190 TF/s machine peak,
    measured best in-program ~134-190 TF/s, microbench_linear.py)
  * ffn          — GeGLU in/out dots
  * conv3x3      — resblock/im2col convs (measured best 112-200 TF/s)
  * other-dot / other-conv — time embedding etc.

plus the minimal HBM traffic of the non-MXU ops (GN/LN stats, SiLU, residual
adds, im2col builds, concats) at the measured copy rate.

The printed table is the "each remaining millisecond sits at a measured
floor" artifact for BASELINE.md: floor @class-rate vs the profiled actuals
(benchmarks/profile_e2e.py / op_profile.py).

Runs anywhere (pure tracing, no device math):
    python benchmarks/flop_floor.py            # SD1.5 b2 (CFG pair) 64^2
    FLOOR_RES=96 FLOOR_SD=2.1 python ...       # SD2.1 768^2 step
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import unet as unet_m

PEAK_TFS = 190.0          # measured 4096^3 bf16 matmul (BASELINE.md round 3)
ATTN_PAD_TFS = 95.0       # d=40 heads: <=50% MXU lanes (BASELINE.md round 3)
COPY_GBS = 645.0          # measured big-copy rate (e2e profile: 151MB/0.234ms)


def _dims(shape):
    return int(np.prod([int(d) for d in shape])) if shape else 1


def classify_dot(eqn):
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dnums
    m = _dims([d for i, d in enumerate(a.shape) if i not in lc and i not in lb])
    n = _dims([d for i, d in enumerate(b.shape) if i not in rc and i not in rb])
    k = _dims([a.shape[i] for i in lc])
    batch = _dims([a.shape[i] for i in lb])
    flops = 2.0 * batch * m * k * n
    if lb:
        # every batched dot in the UNet forward is an attention QK/PV; the
        # head dim (SD1.5: 40/80/160 -> padded 64/128/256, i.e. 1.6x padded
        # FLOPs; SD2.1: 64 everywhere, no padding) is the smallest of m/n/k
        # (BASELINE.md round-3 attention analysis)
        cls = "attn-qk/pv"
        d = min(m, n, k)
        pad = 64 if d <= 64 else (128 if d <= 128 else 256)
        flops *= pad / d
    elif k % 9 == 0 and k >= 576 and (k // 9) % 32 == 0:
        cls = "conv-im2col"   # (BHW, 9C) x (9C, Cout) explicit im2col dot
    elif n >= 4 * k or (k >= 4 * n and k >= 1280):
        cls = "ffn"           # GeGLU in (C -> 8C) / out (4C -> C)
    else:
        cls = "proj"
    return cls, flops, (batch, m, k, n)


def classify_conv(eqn):
    """FLOPs from the actual dimension_numbers: forward convs are HWIO here,
    but grad-of-conv traces as conv_general_dilated with permuted specs
    (dx: flipped kernel + lhs dilation; dw: batch as the contraction), so
    read the kernel's spatial/in-feature dims from rhs_spec instead of
    assuming a layout."""
    x, w = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    rhs = dn.rhs_spec  # (out_feat, in_feat, *spatial)
    groups = int(eqn.params.get("feature_group_count", 1))
    spatial = [int(w.shape[i]) for i in rhs[2:]]
    cin = int(w.shape[rhs[1]])
    cout = int(w.shape[rhs[0]])
    flops = 2.0 * _dims(out.shape) * _dims(spatial) * cin / groups
    ksz = max(spatial) if spatial else 1
    if ksz <= 3:
        cls = "conv3x3" if ksz == 3 else "conv1x1"
    elif ksz > 7:
        cls = "conv-wgrad"  # dw conv: dy is the rhs, spatial dims are big
    else:
        cls = "other-conv"
    return cls, flops, (tuple(spatial), cin, cout, tuple(int(d) for d in x.shape))


MXU_PRIMS = {"dot_general", "conv_general_dilated"}
# Only genuine HBM materializations count toward the glue floor: XLA fuses
# elementwise/norm arithmetic into neighboring dots for free, but concats and
# pads (the im2col builds, skip concats, lane-alignment pads) must write HBM.
BYTES_PRIMS = {"concatenate", "pad"}


def walk(jaxpr, agg, examples):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            cls, fl, info = classify_dot(eqn)
            agg.setdefault(cls, [0.0, 0.0, 0])[0] += fl
            agg[cls][2] += 1
            examples.setdefault(cls, []).append((fl, info))
        elif name == "conv_general_dilated":
            cls, fl, info = classify_conv(eqn)
            agg.setdefault(cls, [0.0, 0.0, 0])[0] += fl
            agg[cls][2] += 1
            examples.setdefault(cls, []).append((fl, info))
        elif name in BYTES_PRIMS:
            nbytes = sum(_dims(v.aval.shape) * v.aval.dtype.itemsize
                         for v in eqn.outvars)
            # read + write (lower bound: count write once, read of same size)
            agg.setdefault("glue-bytes", [0.0, 0.0, 0])[1] += 2 * nbytes
            agg["glue-bytes"][2] += 1
        for sub in jax.core.jaxprs_in_params(eqn.params):
            walk(getattr(sub, "jaxpr", sub), agg, examples)
    return agg


def trace_train_step():
    """Jaxpr of the FULL bench train step (config 4: b4 512^2 DreamBooth+LoRA,
    fwd+bwd, remat off, optimizer+EMA included) with impl="xla" so every dot
    and conv — forward, recompute, dgrad, wgrad — is a visible primitive.
    (VERDICT round-3 item 9: justify 5.56 steps/s or find the next win.)"""
    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T
    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import vae as vae_m

    ucfg, tcfg = unet_m.UNetConfig.sd15(), clip_m.CLIPTextConfig.vit_l()
    vcfg = vae_m.VAEConfig()
    tcfg_cfg = T.TrainConfig(
        rank=128, alpha=128.0, use_ema=True, gradient_checkpointing=False,
        grad_accum_steps=2,
        lora_targets=("q_proj", "k_proj", "v_proj", "out_proj"))
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    base = {
        "unet": jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=jnp.bfloat16), k1),
        "text_encoder": jax.eval_shape(lambda k: clip_m.init_text_model(k, tcfg, dtype=jnp.bfloat16), k2),
        "vae": jax.eval_shape(lambda k: vae_m.init_vae(k, vcfg, dtype=jnp.bfloat16), k3),
    }
    state = jax.eval_shape(
        lambda bp: T.init_train_state(jax.random.key(0), bp, tcfg_cfg), base)
    b = 4
    batch = {
        "images": jax.ShapeDtypeStruct((b, 512, 512, 3), jnp.bfloat16),
        "input_ids": jax.ShapeDtypeStruct((b, 77), jnp.int32),
        "t": jax.ShapeDtypeStruct((b,), jnp.int32),
        "noise": jax.ShapeDtypeStruct((b, 64, 64, 4), jnp.bfloat16),
        "vae_noise": jax.ShapeDtypeStruct((b, 64, 64, 4), jnp.bfloat16),
    }
    schedule = S.make_schedule()

    def full(state, batch, base_params):
        step = T.make_train_step(
            base_params, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
            schedule=schedule, train_cfg=tcfg_cfg, impl="xla")
        return step(state, batch)

    return jax.make_jaxpr(full)(state, batch, base)


def main():
    res = int(os.environ.get("FLOOR_RES", "64"))
    sd = os.environ.get("FLOOR_SD", "1.5")
    b = int(os.environ.get("FLOOR_BATCH", "2"))
    train = os.environ.get("FLOOR_TRAIN", "0") != "0"
    if train:
        jaxpr = trace_train_step()
        header = ("Train step (config 4: b4 512^2 DreamBooth+LoRA fwd+bwd, "
                  "remat off) — analytic floor (pure-XLA jaxpr walk)")
    else:
        cfg = unet_m.UNetConfig.sd15() if sd == "1.5" else unet_m.UNetConfig.sd21()
        cross = cfg.cross_attention_dim if isinstance(cfg.cross_attention_dim, int) else cfg.cross_attention_dim[0]
        key = jax.random.key(0)
        params = jax.eval_shape(
            lambda k: unet_m.init_unet(k, cfg, dtype=jnp.bfloat16), key)
        x = jax.ShapeDtypeStruct((b, res, res, 4), jnp.bfloat16)
        t = jax.ShapeDtypeStruct((b,), jnp.int32)
        cond = jax.ShapeDtypeStruct((b, 77, cross), jnp.bfloat16)

        jaxpr = jax.make_jaxpr(
            lambda p, x, t, c: unet_m.unet_apply(p, x, t, c, cfg, impl="xla")
        )(params, x, t, cond)
        header = f"UNet {sd} step b{b} {res}^2 — analytic floor (pure-XLA jaxpr walk)"
    agg, examples = {}, {}
    walk(jaxpr.jaxpr, agg, examples)

    print(header)
    print(f"{'class':12s} {'GFLOP':>9s} {'GB':>7s} {'n':>4s} "
          f"{'floor@peak':>11s} {'floor@meas':>11s}")
    total_peak = total_meas = 0.0
    # measured best rates per class (TF/s): attention kernel 78 padded
    # (BASELINE round-3), im2col dots 186-194 (e2e profile), Pallas tap conv
    # 126-184 (microbench_conv), XLA in-program projections ~134
    # (microbench_linear), fused GeGLU-FFN kernel ~170 (microbench_ffn)
    MEAS = {"attn-qk/pv": 78.0, "conv3x3": 150.0, "conv1x1": 150.0,
            "conv-im2col": 190.0, "proj": 134.0, "ffn": 170.0,
            "other-conv": 150.0,
            # wgrad convs are tall-K dy-contractions XLA runs as dots; no
            # dedicated microbench — priced at the in-program XLA dot rate
            "conv-wgrad": 134.0}
    for cls, (fl, by, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        if cls == "glue-bytes":
            t_pk = by / (COPY_GBS * 1e9) * 1e3
            t_ms = t_pk
        else:
            rate = ATTN_PAD_TFS if cls == "attn-qk/pv" else PEAK_TFS
            t_pk = fl / (rate * 1e12) * 1e3
            t_ms = fl / (MEAS.get(cls, PEAK_TFS) * 1e12) * 1e3
        total_peak += t_pk
        total_meas += t_ms
        print(f"{cls:12s} {fl/1e9:9.1f} {by/1e9:7.2f} {n:4d} "
              f"{t_pk:9.3f}ms {t_ms:9.3f}ms")
    print(f"{'TOTAL':12s} {'':9s} {'':7s} {'':4s} "
          f"{total_peak:9.3f}ms {total_meas:9.3f}ms")
    print("\nlargest sites per class:")
    for cls, ex in examples.items():
        ex.sort(key=lambda e: -e[0])
        tops = ", ".join(f"{fl/1e9:.1f}GF {info}" for fl, info in ex[:3])
        print(f"  {cls}: {tops}")


if __name__ == "__main__":
    main()
