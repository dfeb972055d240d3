"""Model quantization + calibration harness.

Re-design of the reference utils/quantize_model.py:
  * quantize_cond_encoder / quantize_vae / quantize_unet (:11-52) — the
    reference's torch.ao dynamic-int8 path becomes weight-only per-channel
    int8 on every linear kernel (ops/quantize.py); conv kernels and norms
    stay high-precision, matching torch.ao's Linear-only dynamic behavior.
  * calibrate_cond_encoder / calibrate_unet (:55-947) — the reference ships
    ~900 lines of hardcoded prompt corpus and a full CFG denoise as
    calibration sweeps (never wired to a CLI).  Here calibration runs a
    user-supplied (or small default) corpus through the model and records
    per-layer activation absmax percentiles — the statistics needed for
    static activation quantization.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops.quantize import quantize_tensor

# A small built-in calibration corpus (the reference embeds a ~860-line one
# at utils/quantize_model.py:55-925; pass your own via prompts=).
DEFAULT_CALIBRATION_PROMPTS = (
    "a photo of a cat sitting on a windowsill at sunset",
    "an astronaut riding a horse in photorealistic style",
    "a bowl of fresh fruit on a wooden table, studio lighting",
    "a watercolor painting of a mountain lake at dawn",
    "a futuristic city skyline at night, neon lights, rain",
    "a close-up portrait of an elderly fisherman, dramatic light",
    "a golden retriever puppy playing in autumn leaves",
    "an isometric illustration of a cozy coffee shop",
)


def _quantize_linears(tree, path=""):
    if isinstance(tree, dict):
        if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 2:
            q, scale = quantize_tensor(tree["kernel"], axis=0)  # per-out-channel
            out = {k: v for k, v in tree.items() if k != "kernel"}
            out["kernel_q"] = q
            out["kernel_scale"] = scale
            return out
        return {k: _quantize_linears(v, f"{path}.{k}") for k, v in tree.items()}
    return tree


def quantize_params(params):
    """Weight-only int8 on all rank-2 kernels of a param tree."""
    return _quantize_linears(params)


def quantize_cond_encoder(params):
    """Reference quantize_cond_encoder (:11-24) analog."""
    return quantize_params(params)


def quantize_vae(params):
    """Reference quantize_vae (:26-38) analog (mid-attention linears)."""
    return quantize_params(params)


def quantize_unet(params):
    """Reference quantize_unet (:40-52) analog (attention + FFN linears)."""
    return quantize_params(params)


def quantization_error(params, qparams) -> Dict[str, float]:
    """Per-layer relative RMS error of the quantized kernels (sanity metric)."""
    errs = {}

    def walk(a, b, path=""):
        if isinstance(a, dict):
            if "kernel" in a and "kernel_q" in b:
                w = np.asarray(a["kernel"], np.float32)
                wq = np.asarray(b["kernel_q"], np.float32) * np.asarray(b["kernel_scale"])
                errs[path] = float(
                    np.sqrt(np.mean((w - wq) ** 2)) / (np.sqrt(np.mean(w**2)) + 1e-12)
                )
            else:
                for k in a:
                    walk(a[k], b[k], f"{path}.{k}" if path else k)

    walk(params, qparams)
    return errs


def calibrate_static_activations(apply_fn: Callable, params, batches):
    """Record per-LINEAR-LAYER activation absmax by running ``apply_fn``
    EAGERLY (un-jitted) over the calibration batches, then return a copy of
    ``params`` with an "act_scale" leaf attached to every linear that was
    exercised.  Layers are identified by param-subtree object identity, so
    no name plumbing is needed.

    This is the consumer of the calibration sweep: quantize_params() on the
    result yields a static-PTQ (W8A8) model — the realized version of the
    reference's prepare/convert skeleton (utils/quantize_model.py:21-34)."""
    from stable_diffusion_tpu.models import layers as L

    records: Dict[int, float] = {}
    orig = L.linear

    def capturing(p, x):
        if "kernel" in p or "kernel_q" in p:
            a = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
            key = id(p)
            records[key] = max(records.get(key, 0.0), a)
        return orig(p, x)

    L.linear = capturing
    L.FORCE_UNFUSED_QKV = True  # route fused QKV through linear for capture
    try:
        for batch in batches:
            apply_fn(params, batch)
    finally:
        L.linear = orig
        L.FORCE_UNFUSED_QKV = False

    attached = [0]

    def attach(tree):
        if isinstance(tree, dict):
            if id(tree) in records and ("kernel" in tree or "kernel_q" in tree):
                out = dict(tree)
                out["act_scale"] = jnp.asarray(records[id(tree)], jnp.float32)
                attached[0] += 1
                return out
            return {k: attach(v) for k, v in tree.items()}
        return tree

    result = attach(params)
    # Identity keying only works when apply_fn consumed ``params`` verbatim
    # (eager, no tree_map/device_put copies).  If the records don't re-attach,
    # calibration silently produced a non-quantizable tree — fail loudly.
    if records and attached[0] != len(records):
        raise RuntimeError(
            f"calibration recorded {len(records)} linear layers but only "
            f"{attached[0]} re-attached to the param tree; apply_fn must call "
            "the model eagerly on the SAME params object (no copies)"
        )
    if not records:
        raise RuntimeError(
            "calibration recorded no activations — apply_fn did not route "
            "through models.layers.linear (was it jitted?)"
        )
    return result


def attach_act_scales(params, scale: float = 1.0, *, convs: bool = False):
    """Attach a fixed "act_scale" to every rank-2 linear — and, with
    ``convs=True``, every 3x3 conv kernel — without calibration.

    BENCHMARKING ONLY: the default scale=1.0 is a too-small absmax for real
    activations (post-SiLU ranges typically exceed 1), so the int8 path would
    hard-clip and badly degrade real outputs.  Speed is unaffected by the
    scale value, which is the point — use this to measure the W8A8 path with
    random weights.  For accuracy, run calibrate_static_activations /
    calibrate_static_conv_activations instead."""

    def walk(tree):
        if isinstance(tree, dict):
            k = tree.get("kernel", tree.get("kernel_q"))
            nd = getattr(k, "ndim", 0)
            if k is not None and (nd == 2 or (convs and nd == 4 and k.shape[:2] == (3, 3))):
                out = dict(tree)
                out["act_scale"] = jnp.asarray(scale, jnp.float32)
                return out
            return {k2: walk(v) for k2, v in tree.items()}
        return tree

    return walk(params)


def quantize_convs(params):
    """Per-output-channel int8 on all 3x3 conv kernels (HWIO rank-4).

    Combined with a conv "act_scale" (calibrate_static_conv_activations or
    attach_act_scales(convs=True)), the resblock convs run as int8 x int8
    tap matmuls on the Pallas conv kernel (ops/conv.py W8A8 path) — the
    conv-side realization of the reference's static-PTQ direction
    (utils/quantize_model.py:21-34)."""

    def walk(tree):
        if isinstance(tree, dict):
            k = tree.get("kernel")
            if k is not None and getattr(k, "ndim", 0) == 4 and k.shape[:2] == (3, 3):
                q, scale = quantize_tensor(k.reshape(-1, k.shape[-1]), axis=0)
                out = {k2: v for k2, v in tree.items() if k2 != "kernel"}
                out["kernel_q"] = q.reshape(k.shape)
                out["kernel_scale"] = scale  # (1, Cout)
                return out
            return {k2: walk(v) for k2, v in tree.items()}
        return tree

    return walk(params)


def calibrate_static_conv_activations(apply_fn: Callable, params, batches):
    """Record post-GN-SiLU activation absmax for every resblock conv by
    running ``apply_fn`` eagerly over calibration batches, and return params
    with conv-level "act_scale" leaves attached (the conv analog of
    calibrate_static_activations)."""
    from stable_diffusion_tpu.ops import conv as conv_ops

    conv_ops._CAPTURE = {}
    try:
        for batch in batches:
            apply_fn(params, batch)
        records = dict(conv_ops._CAPTURE)
    finally:
        conv_ops._CAPTURE = None

    attached = [0]

    def attach(tree):
        if isinstance(tree, dict):
            if id(tree) in records:
                out = dict(tree)
                out["act_scale"] = jnp.asarray(records[id(tree)], jnp.float32)
                attached[0] += 1
                return out
            return {k: attach(v) for k, v in tree.items()}
        return tree

    result = attach(params)
    if records and attached[0] != len(records):
        raise RuntimeError(
            f"conv calibration recorded {len(records)} convs but only "
            f"{attached[0]} re-attached; apply_fn must run eagerly on the "
            "SAME params object"
        )
    return result


def quantize_unet_static(params, ucfg, sample_batches, *, impl="xla"):
    """Static W8A8 UNet: calibrate per-linear activation ranges over
    (x, t, cond) sample batches, then int8-quantize the linear kernels.
    The reference's calibrate_unet sweep (:928-947) is the analog corpus."""
    from stable_diffusion_tpu.models import unet as unet_m

    calibrated = calibrate_static_activations(
        lambda p, b: unet_m.unet_apply(p, b[0], b[1], b[2], ucfg, impl=impl),
        params,
        sample_batches,
    )
    return quantize_params(calibrated)


def quantize_text_encoder_static(params, tcfg, ids_batches, *, impl="xla"):
    """Static W8A8 text encoder: calibrate activation ranges over the token
    batches, then quantize the linear kernels.  Every linear the forward
    touches computes int8 x int8 -> int32 (TPU MXU double rate)."""
    from stable_diffusion_tpu.models import clip as clip_m

    calibrated = calibrate_static_activations(
        lambda p, ids: clip_m.text_model_apply(p, jnp.asarray(ids), tcfg, impl=impl),
        params,
        ids_batches,
    )
    return quantize_params(calibrated)


def calibrate_cond_encoder(
    apply_fn: Callable,
    params,
    tokenizer,
    prompts: Sequence[str] = DEFAULT_CALIBRATION_PROMPTS,
    *,
    percentile: float = 99.9,
) -> Dict[str, float]:
    """Run the prompt corpus through the text encoder and record activation
    ranges (reference calibrate_cond_encoder, :55-925)."""
    stats: List[float] = []
    for prompt in prompts:
        ids = tokenizer(
            [prompt], padding="max_length", max_length=77, truncation=True
        ).input_ids
        out = np.asarray(apply_fn(params, jnp.asarray(ids)))
        stats.append(np.percentile(np.abs(out), percentile))
    return {"activation_absmax": float(np.max(stats)), "n_prompts": len(prompts)}


def calibrate_unet(
    denoise_fn: Callable,
    *,
    latent_shape=(1, 64, 64, 4),
    steps: int = 50,
    seed: int = 0,
) -> Dict[str, float]:
    """Full CFG denoise on random latents as a calibration sweep (reference
    calibrate_unet, :928-947).  ``denoise_fn(latents, key)`` should run the
    model's denoise loop and return final latents."""
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    latents = jax.random.normal(k1, latent_shape, jnp.float32)
    out = np.asarray(denoise_fn(latents, k2))
    return {
        "latent_absmax": float(np.max(np.abs(out))),
        "steps": steps,
    }
