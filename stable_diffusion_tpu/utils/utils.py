"""Model/tokenizer loading glue (reference utils/utils.py:1-20, whose
create_model call signature is broken — SURVEY 2.12.4; fixed here)."""

from __future__ import annotations

import os
import time
from typing import Tuple


def create_tokenizer(tokenizer_dir: str):
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(tokenizer_dir)


def create_model(model_path: str, *, sd_version: str = "1.5", dtype=None, tokenizer=None):
    """diffusers-layout dir OR single LDM .ckpt -> StableDiffusion pipeline."""
    import jax.numpy as jnp

    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m
    from stable_diffusion_tpu.pipeline import StableDiffusion
    from stable_diffusion_tpu.utils import model_converter as mc

    dtype = dtype or jnp.float32
    if os.path.isdir(model_path):
        return StableDiffusion.from_pretrained(
            model_path, sd_version=sd_version, dtype=dtype, tokenizer=tokenizer
        )
    params = mc.load_ldm_checkpoint(model_path, sd_version=sd_version)
    v1 = sd_version.startswith("1")
    return StableDiffusion(
        params=params,
        unet_config=unet_m.UNetConfig.sd15() if v1 else unet_m.UNetConfig.sd21(),
        text_config=clip_m.CLIPTextConfig.vit_l() if v1 else clip_m.CLIPTextConfig.vit_h(),
        vae_config=vae_m.VAEConfig(),
        tokenizer=tokenizer,
        dtype=dtype,
        sd_version=sd_version,
    )


def load_model(args) -> Tuple[object, object]:
    """argparse-args loader used by the training CLI (reference
    utils/utils.py:14-21, with the broken create_model call fixed)."""
    t0 = time.time()
    tokenizer = create_tokenizer(args.tokenizer_dir)
    model = create_model(
        args.model_path, sd_version=getattr(args, "sd_version", "1.5"), tokenizer=tokenizer
    )
    print(f"\n\nLoading model took: {time.time() - t0:.2f} seconds")
    return model, tokenizer
