"""Fréchet Inception Distance — native implementation.

The reference's FID lives commented-out behind torchmetrics (reference
evaluation.py:21-31, 96-107).  Here the metric is computed directly:

  FID = ||mu_r - mu_f||^2 + Tr(S_r + S_f - 2 (S_r S_f)^{1/2})

Feature extraction runs on-device (jitted); the final statistics are tiny
(2048-d mean + covariance), so the matrix square root runs on host via
scipy (exact, f64) — aggregation is not TPU work.

Two backbones:
  * "inception": the standard InceptionV3-pool3 tower
    (models/inception.py), weights from a local torchvision/pytorch-fid
    state dict (zero-egress container: the file must be supplied).
  * "clip": CLIP-FID (Kynkäänniemi et al. 2022, arXiv 2203.06026) using our
    CLIP vision tower's image embedding — works out of the box with any HF
    CLIPModel dir (the same one CLIP-score uses).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D)), float64."""
    f = np.asarray(feats, np.float64)
    assert f.ndim == 2 and f.shape[0] >= 2, f.shape
    return f.mean(axis=0), np.cov(f, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians; jitters the covariances by
    eps*I if the product is numerically singular."""
    from scipy import linalg

    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    diff = mu1 - mu2

    def _sqrtm(a):
        out = linalg.sqrtm(a)  # scipy>=1.17 returns the array alone
        return out[0] if isinstance(out, tuple) else out

    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        # symmetric-PSD product: imaginary parts are numerical noise
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(covmean))


def fid_from_features(real_feats: np.ndarray, fake_feats: np.ndarray) -> float:
    mu_r, s_r = feature_stats(real_feats)
    mu_f, s_f = feature_stats(fake_feats)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def make_feature_fn(backbone: str, weights_path: str = "", clip_model_dir: str = ""):
    """Returns a jitted (B, H, W, 3)-in-[0,1] -> (B, D) feature function.

    backbone "inception" needs ``weights_path`` (torchvision/pytorch-fid
    state dict); backbone "clip" needs ``clip_model_dir`` (HF CLIPModel dir).
    """
    import functools
    import json
    import os

    import jax

    if backbone == "inception":
        from stable_diffusion_tpu.models import inception as inc

        params = inc.load_inception_params(weights_path)

        @jax.jit
        def features(images01):
            return inc.pool3_features(params, images01)

        return features

    if backbone == "clip":
        import jax.numpy as jnp

        from stable_diffusion_tpu.models import clip as clip_m
        from stable_diffusion_tpu.utils import model_converter as mc
        from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict

        with open(os.path.join(clip_model_dir, "config.json")) as f:
            cfg = json.load(f)
        vcfg = clip_m.CLIPVisionConfig.from_dict(cfg.get("vision_config", cfg))
        params = from_torch_state_dict(
            mc.read_checkpoint(os.path.join(clip_model_dir, "model.safetensors"))
        )

        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

        @jax.jit
        def features(images01):
            size = vcfg.image_size
            b = images01.shape[0]
            x = jax.image.resize(
                images01.astype(jnp.float32), (b, size, size, 3), "bilinear"
            )
            return clip_m.clip_image_embed(params, (x - mean) / std, vcfg)

        return features

    raise ValueError(f"unknown FID backbone {backbone!r}")
