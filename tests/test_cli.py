"""End-to-end CLI integration: synthesize a tiny diffusers-layout model dir
(+ minimal CLIPTokenizer), then drive inference.py's main() through argv."""

import json
import os
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stable_diffusion_tpu.models import clip as jclip
from stable_diffusion_tpu.models import unet as junet
from stable_diffusion_tpu.models import vae as jvae
from stable_diffusion_tpu.utils.torch_interop import flatten_tree

TINY_UNET = dict(
    block_out_channels=(32, 64, 64, 64),
    attention_head_dim=(2, 4, 4, 4),
    cross_attention_dim=24,
    t_embed_dim=16,
)
TINY_TEXT = dict(
    hidden_size=24, intermediate_size=48, num_hidden_layers=2,
    num_attention_heads=4, max_position_embeddings=77, vocab_size=49408,
)

_RES_INV = {
    "groupnorm_1": "norm1", "conv_1": "conv1", "t_embed": "time_emb_proj",
    "groupnorm_2": "norm2", "conv_2": "conv2", "proj_input": "conv_shortcut",
}
_ATTN_INV = {
    "groupnorm": "norm", "conv_input": "proj_in", "conv_output": "proj_out",
    "transformer_block.layernorm_1": "transformer_blocks.0.norm1",
    "transformer_block.layernorm_2": "transformer_blocks.0.norm2",
    "transformer_block.layernorm_3": "transformer_blocks.0.norm3",
    "transformer_block.attn1.q_proj": "transformer_blocks.0.attn1.to_q",
    "transformer_block.attn1.k_proj": "transformer_blocks.0.attn1.to_k",
    "transformer_block.attn1.v_proj": "transformer_blocks.0.attn1.to_v",
    "transformer_block.attn1.out_proj": "transformer_blocks.0.attn1.to_out.0",
    "transformer_block.attn2.q_proj": "transformer_blocks.0.attn2.to_q",
    "transformer_block.attn2.k_proj": "transformer_blocks.0.attn2.to_k",
    "transformer_block.attn2.v_proj": "transformer_blocks.0.attn2.to_v",
    "transformer_block.attn2.out_proj": "transformer_blocks.0.attn2.to_out.0",
    "transformer_block.ffn.0.proj": "transformer_blocks.0.ff.net.0.proj",
    "transformer_block.ffn.1": "transformer_blocks.0.ff.net.2",
}


def _to_diffusers_unet_name(stem: str) -> str:
    """Inverse of the converter's UNet rules, on the module path (no leaf) —
    used only to synthesize a diffusers-format test checkpoint."""
    simple = {
        "time_embedding.ffn.0": "time_embedding.linear_1",
        "time_embedding.ffn.2": "time_embedding.linear_2",
        "encoder.conv_in": "conv_in",
        "output.0": "conv_norm_out",
        "output.2": "conv_out",
    }
    if stem in simple:
        return simple[stem]
    m = re.fullmatch(r"encoder\.down\.(\d+)\.downsample\.conv", stem)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0.conv"
    m = re.fullmatch(r"decoder\.up\.(\d+)\.upsample\.conv", stem)
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0.conv"
    m = re.fullmatch(r"bottleneck\.(\d)\.(.*)", stem)
    if m:
        k, inner = m.groups()
        if k in ("0", "2"):
            return f"mid_block.resnets.{0 if k == '0' else 1}.{_RES_INV[inner]}"
        return f"mid_block.attentions.0.{_ATTN_INV[inner]}"
    m = re.fullmatch(r"(encoder\.down|decoder\.up)\.(\d+)\.block\.(\d+)\.(\d)\.(.*)", stem)
    if m:
        root, stage, block, kind, inner = m.groups()
        tgt = "down_blocks" if root == "encoder.down" else "up_blocks"
        sub = "resnets" if kind == "0" else "attentions"
        table = _RES_INV if kind == "0" else _ATTN_INV
        return f"{tgt}.{stage}.{sub}.{block}.{table[inner]}"
    raise KeyError(stem)


def _save_torch_flavor(flat, path):
    """our pytree leaves -> torch-layout tensors in a safetensors file."""
    import torch
    from safetensors.torch import save_file

    out = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        if k.endswith(".kernel") and arr.ndim == 4:
            k, arr = k[: -len("kernel")] + "weight", arr.transpose(3, 2, 0, 1)
        elif k.endswith(".kernel"):
            k, arr = k[: -len("kernel")] + "weight", arr.T
        elif k.endswith(".scale"):
            k = k[: -len("scale")] + "weight"
        elif k.endswith(".embedding"):
            k = k[: -len("embedding")] + "weight"
        out[k] = torch.from_numpy(np.ascontiguousarray(arr))
    save_file(out, path)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("model")
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)

    # unet (diffusers naming via the inverse map)
    ucfg = junet.UNetConfig(**TINY_UNET)
    utree = flatten_tree(junet.init_unet(k1, ucfg))
    (root / "unet").mkdir()
    remapped = {}
    for k, v in utree.items():
        stem, leaf = k.rsplit(".", 1)
        remapped[f"{_to_diffusers_unet_name(stem)}.{leaf}"] = v
    _save_torch_flavor(remapped, str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    with open(root / "unet" / "config.json", "w") as f:
        json.dump({
            "block_out_channels": list(TINY_UNET["block_out_channels"]),
            "attention_head_dim": list(TINY_UNET["attention_head_dim"]),
            "cross_attention_dim": TINY_UNET["cross_attention_dim"],
            "t_embed_dim": 16,
            "in_channels": 4, "out_channels": 4,
        }, f)

    # text encoder (HF naming == ours + text_model. prefix)
    tcfg = jclip.CLIPTextConfig(**TINY_TEXT)
    ttree = flatten_tree(jclip.init_text_model(k2, tcfg))
    (root / "text_encoder").mkdir()
    _save_torch_flavor(
        {f"text_model.{k}": v for k, v in ttree.items()},
        str(root / "text_encoder" / "model.safetensors"),
    )
    with open(root / "text_encoder" / "config.json", "w") as f:
        json.dump(TINY_TEXT, f)

    # vae (diffusers naming == ours)
    vcfg = jvae.VAEConfig(ch_mult=(1, 1, 1, 1), base_channels=32)
    vtree = flatten_tree(jvae.init_vae(k3, vcfg))
    (root / "vae").mkdir()
    _save_torch_flavor(vtree, str(root / "vae" / "diffusion_pytorch_model.safetensors"))
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"in_channels": 3, "latent_channels": 4,
                   "block_out_channels": [32, 32, 32, 32]}, f)

    (root / "scheduler").mkdir()
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"num_train_timesteps": 1000, "beta_start": 0.00085,
                   "beta_end": 0.012, "prediction_type": "epsilon"}, f)

    # minimal tokenizer
    tok = root / "tokenizer"
    tok.mkdir()
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, w in enumerate(["a</w>", "cat</w>", "photo</w>", "of</w>"]):
        vocab[w] = i + 2
    json.dump(vocab, open(tok / "vocab.json", "w"))
    open(tok / "merges.txt", "w").write("#version: 0.2\n")
    return root


def test_from_pretrained_pipeline(model_dir):
    """Pipeline.from_pretrained over a (tiny) stock-layout model dir: the
    converter, config parsing, and generate all wired together.

    NOTE: the tiny VAE is ch_mult=(1,1,1,1) base 32 — not the reference VAE
    config — from_pretrained's VAEConfig.from_dict only reads channel counts,
    so we patch the config after load."""
    from stable_diffusion_tpu import pipeline as pl_mod
    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer(
        str(model_dir / "tokenizer" / "vocab.json"),
        str(model_dir / "tokenizer" / "merges.txt"),
    )
    pipe = pl_mod.StableDiffusion.from_pretrained(
        str(model_dir), sd_version="2.1", tokenizer=tokenizer
    )
    pipe.vae_config = jvae.VAEConfig(ch_mult=(1, 1, 1, 1), base_channels=32)
    imgs = pipe.generate(
        prompt="a photo of a cat", uncond_prompt="", do_cfg=True, cfg_scale=3.0,
        inference_steps=2, sampler="ddim", img_size=(32, 32), seed=1,
    )
    assert imgs.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(imgs))


def test_inference_cli_main(model_dir, tmp_path):
    """Drive inference.py's main() through argv: argparse, from_pretrained,
    generate, and image files written (reference CLI surface)."""
    import inference as inf

    out_dir = str(tmp_path / "out")
    inf.main([
        "--model_path", str(model_dir),
        "--tokenizer_dir", str(model_dir / "tokenizer"),
        "--prompt", "a photo of a cat",
        "--do_cfg", "--cfg_scale", "3.0",
        "--sampler", "ddim",
        "--num_inference_steps", "2",
        "--img_size", "32",
        "--n_samples", "1",
        "--batch_size", "1",
        "--seed", "7",
        "--sd_version", "2.1",
        "--dtype", "float32",
        "--output_dir", out_dir,
    ])
    files = os.listdir(out_dir)
    assert any(f.endswith(".jpg") for f in files), files


def test_fast_path_matches_modular(model_dir):
    """The fused one-dispatch txt2img program must equal the modular
    (return_latents + decode) composition bit-for-bit on CPU."""
    import jax.numpy as jnp

    from stable_diffusion_tpu import pipeline as pl_mod
    from stable_diffusion_tpu.pipeline import _decode_jit
    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer(
        str(model_dir / "tokenizer" / "vocab.json"),
        str(model_dir / "tokenizer" / "merges.txt"),
    )
    pipe = pl_mod.StableDiffusion.from_pretrained(
        str(model_dir), sd_version="2.1", tokenizer=tokenizer
    )
    pipe.vae_config = jvae.VAEConfig(ch_mult=(1, 1, 1, 1), base_channels=32)
    kw = dict(prompt="a cat", uncond_prompt="", do_cfg=True, cfg_scale=3.0,
              inference_steps=2, sampler="ddim", img_size=(32, 32), seed=9)
    fast = pipe.generate(**kw)
    lat = pipe.generate(**kw, return_latents=True)
    modular = np.asarray(
        (_decode_jit(pipe.params["vae"], jnp.asarray(lat), pipe.vae_config,
                     pipe.impl).astype(jnp.float32) + 1.0) / 2.0
    )
    # the fused program encodes [uncond; cond] in ONE batched call; the
    # modular path uses two — XLA fuses them differently, so agreement is to
    # f32 rounding (~3e-5), not bitwise
    np.testing.assert_allclose(fast, modular, atol=1e-3)
