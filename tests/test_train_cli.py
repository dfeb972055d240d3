"""End-to-end trainer CLI integration: tiny models + synthetic DreamBooth
data, one epoch through train(), checkpoint written and resumable."""

import json
import os

import numpy as np
import jax
import pytest

# drives the full training CLI (jitted fwd+bwd step + checkpoint + resume);
# ~150 s alone on this box's single core — out of the per-commit tier
pytestmark = pytest.mark.heavy

from stable_diffusion_tpu.models import clip as jclip
from stable_diffusion_tpu.models import unet as junet
from stable_diffusion_tpu.models import vae as jvae


class FakeTok:
    def __call__(self, prompt, **kw):
        class R:
            input_ids = [1, 2, 3]

        return R()

    def pad(self, enc, *, padding, max_length, return_tensors):
        ids = np.zeros((len(enc["input_ids"]), max_length), np.int64)
        for i, row in enumerate(enc["input_ids"]):
            ids[i, : len(row)] = row
        return {"input_ids": ids}


@pytest.fixture
def data_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for d, label in [("instance_data", "a sks dog"), ("class_prior_data", "a dog")]:
        (tmp_path / d).mkdir()
        for i in range(2):
            Image.fromarray((rng.random((20, 20, 3)) * 255).astype(np.uint8)).save(
                tmp_path / d / f"{i}.png"
            )
        (tmp_path / d / "label.txt").write_text(label)
    return tmp_path


def test_train_cli_one_epoch(data_dir, tmp_path):
    import train_lora_dreambooth as tld

    args = tld.build_parser().parse_args([
        "--data_dir", str(data_dir),
        "--img_size", "16",
        "--batch_size", "2",
        "--max_train_steps", "1",
        "--use_lora",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--lr", "1e-3",
        "--seed", "0",
    ])

    ucfg = junet.UNetConfig(
        block_out_channels=(32, 64, 64, 64), attention_head_dim=(2, 4, 4, 4),
        cross_attention_dim=32, t_embed_dim=16,
    )
    tcfg = jclip.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=77, vocab_size=64,
    )
    vcfg = jvae.VAEConfig(ch_mult=(1, 1), base_channels=32)
    ks = jax.random.split(jax.random.key(0), 3)
    base = {
        "unet": junet.init_unet(ks[0], ucfg),
        "text_encoder": jclip.init_text_model(ks[1], tcfg),
        "vae": jvae.init_vae(ks[2], vcfg),
    }

    # tiny VAE here downsamples /2, so patch the latent factor sampling
    from stable_diffusion_tpu import training as T

    orig = T.sample_batch_noise
    T.sample_batch_noise = lambda key, imgs, **kw: orig(key, imgs, latent_factor=2)
    try:
        state = tld.train(args, base, ucfg, tcfg, vcfg, FakeTok())
    finally:
        T.sample_batch_noise = orig
    assert int(np.asarray(state["step"])) >= 1
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any("epoch-0" in c for c in ckpts)
