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


def _tiny_base():
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
    return base, ucfg, tcfg, vcfg


def _run_train(data_dir, tmp_path, base, cfgs, extra_args=(), subdir="ckpt"):
    """One train() invocation on the tiny stack; tiny VAE downsamples /2,
    so patch the latent-factor of the uncached noise sampling."""
    import train_lora_dreambooth as tld
    from stable_diffusion_tpu import training as T

    ucfg, tcfg, vcfg = cfgs
    args = tld.build_parser().parse_args([
        "--data_dir", str(data_dir),
        "--img_size", "16",
        "--batch_size", "2",
        "--max_train_steps", "1",
        "--use_lora",
        "--checkpoint_dir", str(tmp_path / subdir),
        "--lr", "1e-3",
        "--seed", "0",
        *extra_args,
    ])
    orig = T.sample_batch_noise
    T.sample_batch_noise = lambda key, imgs, **kw: orig(key, imgs, latent_factor=2)
    try:
        return tld.train(args, base, ucfg, tcfg, vcfg, FakeTok())
    finally:
        T.sample_batch_noise = orig


def test_train_cli_one_epoch(data_dir, tmp_path):
    base, ucfg, tcfg, vcfg = _tiny_base()
    # default path IS the cached-frozen-encoder one (--cache_latents on)
    state = _run_train(data_dir, tmp_path, base, (ucfg, tcfg, vcfg))
    assert int(np.asarray(state["step"])) >= 1
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any("epoch-0" in c for c in ckpts)


def test_train_cli_cached_matches_uncached(data_dir, tmp_path, capsys):
    """Same seed, cache on vs off: identical noise stream and batch order by
    construction (DataLoader.iter_indices is shared), so the first-step
    train loss (computed BEFORE any update, on identical batches) agrees to
    cross-program FP noise (tests/test_training_cached.py pins the floor).
    The post-update states only get a loose bound: the first AdamW step is
    ~lr*sign(grad), which amplifies FP-noise-level gradients of near-zero
    elements to full lr scale — a wiring bug (wrong image/prompt mapping)
    would still blow past it by orders of magnitude."""
    import re

    base, ucfg, tcfg, vcfg = _tiny_base()
    s_cached = _run_train(data_dir, tmp_path, base, (ucfg, tcfg, vcfg),
                          subdir="ckpt_c")
    out_c = capsys.readouterr().out
    s_plain = _run_train(data_dir, tmp_path, base, (ucfg, tcfg, vcfg),
                         extra_args=["--no-cache_latents"], subdir="ckpt_u")
    out_u = capsys.readouterr().out
    assert int(np.asarray(s_cached["step"])) == int(np.asarray(s_plain["step"]))

    def first_loss(out):
        m = re.search(r"epoch 0: loss=([0-9.]+)", out)
        assert m, out
        return float(m.group(1))

    lc, lu = first_loss(out_c), first_loss(out_u)
    assert abs(lc - lu) <= 1e-3 * abs(lu) + 1e-4, (lc, lu)
    # Per-element: an Adam update is in [-lr, lr]; FP-noise sign flips on
    # near-zero-grad elements can move an element by up to 2*lr, so only the
    # FRACTION of gross disagreements is meaningful.  A wiring bug flips
    # essentially all of them (different images => different grads
    # everywhere); noise flips a rare borderline element.
    lr = 1e-3
    total, gross = 0, 0
    for a, b in zip(jax.tree.leaves(s_cached["lora"]), jax.tree.leaves(s_plain["lora"])):
        d = np.abs(np.asarray(a) - np.asarray(b))
        total += d.size
        gross += int(np.sum(d > 0.5 * lr))
    assert gross <= max(0.02 * total, 2), f"{gross}/{total} elements differ >lr/2"
