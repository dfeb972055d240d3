"""Per-site SQNR sweep for the static-W8A8 calibration under norm-gain drift.

Why this exists: the quality table (BASELINE.md) characterizes W8A8 and
DeepCache error with deterministic RANDOM-INIT weights — no real checkpoints
exist in this container.  The obvious objection is that trained weights may
produce activation distributions the random-weight calibration never saw.
This sweep quantifies how far that objection can go for the quantized sites
specifically: every tensor we feed to an int8 input-quantizer is
POST-NORMALIZATION —

  * W8A8 linears consume post-LayerNorm activations (attention/FFN blocks)
    or post-GroupNorm-SiLU ones (time embeddings are bounded by SiLU);
  * W8A8 convs consume post-GroupNorm-SiLU activations by construction
    (ops/conv.gn_silu_conv3x3 quantizes AFTER the fused GN+SiLU prologue).

Normalization pins the pre-gain distribution to zero-mean/unit-variance
regardless of what the weights upstream are; the only degree of freedom a
trained model has over a quantizer input's scale is the learned norm gain
(and bias).  So instead of arguing about weights, sweep the gains: multiply
every norm "scale" leaf in the UNet by m and measure, per quantized site,
the SQNR = 10*log10(E[x^2] / E[(x - Q(x))^2]) of the static int8 input
quantizer whose act_scale was calibrated at m=1, plus the absmax drift
ratio.  A final column recalibrates AT m=4 to show the error is a stale
-scale artifact, not an int8 limit.

What it shows (recorded in BASELINE.md): at m=1 every site class sits at
int8-typical SQNR; scaling the gains moves per-site absmax nearly
proportionally (the distribution-pinning claim, measured) and static scales
lose SQNR exactly as a clipped-static-scale model predicts; recalibration
restores it.  I.e. the random-weights quality table transfers to trained
weights up to norm-gain drift, and a 30-image calibration sweep on the real
checkpoint (utils/quantize_model.calibrate_*) absorbs that drift entirely.

Run (CPU eager, ~20 min single-core):  python benchmarks/sqnr_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import clip as clip_m
from stable_diffusion_tpu.models import layers as L
from stable_diffusion_tpu.models import unet as unet_m
from stable_diffusion_tpu.ops import conv as conv_ops
from stable_diffusion_tpu.utils import quantize_model as QM

GAIN_MULTS = (0.5, 1.0, 2.0, 4.0)


def build_unet():
    k1, _ = jax.random.split(jax.random.key(0))
    ucfg = unet_m.UNetConfig.sd15()
    params = unet_m.init_unet(k1, ucfg, dtype=jnp.bfloat16)
    return params, ucfg


def make_batches(tcfg_ctx_dim=768, n=2):
    batches = []
    for i, t in enumerate((999, 100)[:n]):
        x = jax.random.normal(jax.random.key(10 + i), (2, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(jax.random.key(20 + i), (2, 77, tcfg_ctx_dim),
                                jnp.bfloat16)
        batches.append((x, jnp.asarray([t], jnp.int32), ctx))
    return batches


def calibrate(params, ucfg, batches):
    apply = lambda p, b: unet_m.unet_apply(p, b[0], b[1], b[2], ucfg, impl="xla")
    cal = QM.calibrate_static_activations(apply, params, batches)
    cal = QM.calibrate_static_conv_activations(apply, cal, batches)
    return cal


def scale_norm_gains(tree, m):
    """Multiply every norm {"scale", "bias"} leaf pair's scale by m.  Norm
    param dicts are exactly {scale, bias} with 1-D scale; linear/conv dicts
    always carry a kernel, so the keyset disambiguates."""
    if isinstance(tree, dict):
        if set(tree.keys()) == {"scale", "bias"} and tree["scale"].ndim == 1:
            return dict(tree, scale=tree["scale"] * jnp.asarray(m, tree["scale"].dtype))
        return {k: scale_norm_gains(v, m) for k, v in tree.items()}
    return tree


def path_index(tree, path=""):
    """id(subtree) -> dotted path for every dict carrying act_scale."""
    out = {}
    if isinstance(tree, dict):
        if "act_scale" in tree:
            out[id(tree)] = path
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(path_index(v, f"{path}.{k}" if path else k))
    return out


def classify(path):
    toks = path.split(".")
    if any(t.startswith("conv") for t in toks):
        return "conv"
    if any("attn" in t for t in toks):
        return "attention"
    if any(t in ("ffn", "geglu") or t.startswith("ff") for t in toks):
        return "ffn"
    if any("time" in t or "emb" in t for t in toks):
        return "time-emb"
    return "other"


def sqnr_db(x, s_absmax):
    xf = np.asarray(x, np.float64)
    s = max(float(s_absmax), 1e-12) / 127.0
    xq = np.round(np.clip(xf / s, -127.0, 127.0)) * s
    num = float(np.mean(xf * xf))
    den = float(np.mean((xf - xq) ** 2))
    return 10.0 * np.log10(max(num, 1e-30) / max(den, 1e-30))


def run_sweep(cal_m, batches, paths):
    """One eager forward with capture hooks that score each quantized site's
    input against ITS act_scale in cal_m; returns {path: (sqnr, ratio)}."""
    results = {}

    orig_linear = L.linear

    def scoring_linear(p, x):
        if ("kernel" in p or "kernel_q" in p) and "act_scale" in p and id(p) in paths:
            xf = np.asarray(x.astype(jnp.float32))
            s = float(p["act_scale"])
            results[paths[id(p)]] = (sqnr_db(xf, s),
                                     float(np.max(np.abs(xf))) / max(s, 1e-12))
        return orig_linear(p, x)

    orig_conv_cap = conv_ops._capture_conv_input

    def scoring_conv_cap(gn_params, conv_params, x, num_groups, eps):
        if "act_scale" in conv_params and id(conv_params) in paths:
            y = L.silu(L.group_norm(gn_params, x, num_groups=num_groups, eps=eps))
            yf = np.asarray(y.astype(jnp.float32))
            s = float(conv_params["act_scale"])
            results[paths[id(conv_params)]] = (
                sqnr_db(yf, s), float(np.max(np.abs(yf))) / max(s, 1e-12))

    L.linear = scoring_linear
    L.FORCE_UNFUSED_QKV = True
    conv_ops._capture_conv_input = scoring_conv_cap
    conv_ops._CAPTURE = {}  # arms the gn_silu_conv3x3 hook
    try:
        x, t, ctx = batches[0]
        unet_m.unet_apply(cal_m, x, t, ctx, UCFG, impl="xla")
    finally:
        L.linear = orig_linear
        L.FORCE_UNFUSED_QKV = False
        conv_ops._capture_conv_input = orig_conv_cap
        conv_ops._CAPTURE = None
    return results


def summarize(results):
    by_class = {}
    for path, (snr, ratio) in results.items():
        by_class.setdefault(classify(path), []).append((snr, ratio))
    rows = {}
    for cls, vals in sorted(by_class.items()):
        snrs = np.asarray([v[0] for v in vals])
        ratios = np.asarray([v[1] for v in vals])
        rows[cls] = (len(vals), float(np.min(snrs)), float(np.median(snrs)),
                     float(np.median(ratios)))
    return rows


def main():
    global UCFG
    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        params, UCFG = build_unet()
        batches = make_batches()
        print(f"built UNet ({time.time()-t0:.0f}s)", flush=True)
        cal = calibrate(params, UCFG, batches)
        paths = path_index(cal)
        n_conv = sum(1 for p in paths.values() if classify(p) == "conv")
        print(f"calibrated {len(paths)} sites ({n_conv} convs) "
              f"({time.time()-t0:.0f}s)", flush=True)

        header = f"{'m':>5} {'class':<10} {'n':>4} {'SQNR min':>9} {'SQNR med':>9} {'absmax/s med':>13}"
        print(header)
        for m in GAIN_MULTS:
            cal_m = scale_norm_gains(cal, m) if m != 1.0 else cal
            # gains change the tree objects; act_scale ids move with them, so
            # re-index on the perturbed tree
            paths_m = path_index(cal_m)
            res = run_sweep(cal_m, batches, paths_m)
            for cls, (n, mn, med, rmed) in summarize(res).items():
                print(f"{m:>5} {cls:<10} {n:>4} {mn:>9.1f} {med:>9.1f} {rmed:>13.2f}",
                      flush=True)

        # recalibrate AT the worst drift: strip scales, recalibrate, rescore
        m = GAIN_MULTS[-1]
        drifted = scale_norm_gains(params, m)
        recal = calibrate(drifted, UCFG, batches)
        res = run_sweep(recal, batches, path_index(recal))
        for cls, (n, mn, med, rmed) in summarize(res).items():
            print(f"recal@{m} {cls:<9} {n:>4} {mn:>9.1f} {med:>9.1f} {rmed:>13.2f}",
                  flush=True)
        print(f"done ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
