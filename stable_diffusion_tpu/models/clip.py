"""Text encoders: OpenCLIP ViT-H tower (SD 2.1) and CLIP ViT-L tower (SD 1.5).

Reference parity targets:
  * ``CLIPTextModel`` / ``OpenCLIP`` — models/clip/openclip.py:54-170
    (pre-LN transformer, GELU MLP, causal mask, final LayerNorm; equals HF
    CLIPTextModel.last_hidden_state).
  * ``TextEncoder`` — models/clip/clip.py:8-95 (12 layers, 768 dim, 12 heads,
    QuickGELU, causal mask).
  * ``ClassEncoder`` — models/clip/clip.py:96-102 (label embedding table).

Both towers reduce to one config-driven implementation here; the only
behavioral deltas in the reference are width/depth and GELU-vs-QuickGELU.
Param key paths mirror the reference state_dict names so torch checkpoints
ingest mechanically (see utils/torch_interop.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.models.attention import multihead_attention, init_multihead_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """Mirrors the diffusers/transformers text_encoder config.json
    (reference models/clip/openclip.py:12-52)."""

    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # "gelu" (ViT-H) | "quick_gelu" (ViT-L)
    layer_norm_eps: float = 1e-5
    # kept for config.json round-trip parity (unused in forward math):
    attention_dropout: float = 0.0
    dropout: float = 0.0
    bos_token_id: int = 0
    eos_token_id: int = 2
    pad_token_id: int = 1
    projection_dim: int = 512

    @classmethod
    def from_dict(cls, data: dict) -> "CLIPTextConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    @classmethod
    def vit_l(cls) -> "CLIPTextConfig":
        """SD 1.5 CLIP ViT-L/14 text tower (reference models/clip/clip.py:8-16)."""
        return cls(
            hidden_size=768,
            intermediate_size=3072,
            num_hidden_layers=12,
            num_attention_heads=12,
            hidden_act="quick_gelu",
            projection_dim=768,
        )

    @classmethod
    def vit_h(cls) -> "CLIPTextConfig":
        """SD 2.1 OpenCLIP ViT-H text tower (reference openclip.py:12-30)."""
        return cls()


def _act(name: str):
    return layers.quick_gelu if name == "quick_gelu" else layers.gelu


def _mlp(params, x, act):
    h = layers.linear(params["fc1"], x)
    h = act(h)
    return layers.linear(params["fc2"], h)


def _transformer_layer(params, x, cfg: CLIPTextConfig, impl: str):
    """Pre-LN block: LN -> causal self-attn -> +res; LN -> MLP -> +res
    (reference openclip.py:91-110 / clip.py:60-95)."""
    res = x
    h = layers.layer_norm(params["layer_norm1"], x, eps=cfg.layer_norm_eps)
    h = multihead_attention(
        params["self_attn"], h, num_heads=cfg.num_attention_heads, causal=True, impl=impl
    )
    x = h + res
    res = x
    h = layers.layer_norm(params["layer_norm2"], x, eps=cfg.layer_norm_eps)
    h = _mlp(params["mlp"], h, _act(cfg.hidden_act))
    return h + res


def text_model_apply(
    params, input_ids: jax.Array, cfg: CLIPTextConfig, *, impl: str = "auto", dtype=jnp.float32
) -> jax.Array:
    """Token ids (B, S) -> last hidden state (B, S, hidden).

    Matches reference CLIPTextModel.forward (openclip.py:123-138): token +
    position embeddings, N pre-LN causal layers, final LayerNorm.
    """
    emb = params["embeddings"]
    seq = input_ids.shape[-1]
    x = layers.embedding(emb["token_embedding"], input_ids)
    x = x + emb["position_embedding"]["embedding"][:seq]
    x = x.astype(dtype)
    for i in range(cfg.num_hidden_layers):
        x = _transformer_layer(params["encoder"]["layers"][str(i)], x, cfg, impl)
    return layers.layer_norm(params["final_layer_norm"], x, eps=cfg.layer_norm_eps)


def openclip_apply(params, input_ids, cfg: CLIPTextConfig, **kw) -> jax.Array:
    """OpenCLIP.encode_text (openclip.py:167-170): params rooted at "text_model"."""
    return text_model_apply(params["text_model"], input_ids, cfg, **kw)


def init_text_model(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 3 + cfg.num_hidden_layers))
    lyrs = {}
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(next(ks), 3)
        lyrs[str(i)] = {
            "layer_norm1": layers.init_norm(cfg.hidden_size, dtype),
            "self_attn": init_multihead_attention(lk[0], cfg.hidden_size, dtype=dtype),
            "layer_norm2": layers.init_norm(cfg.hidden_size, dtype),
            "mlp": {
                "fc1": layers.init_linear(lk[1], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
                "fc2": layers.init_linear(lk[2], cfg.intermediate_size, cfg.hidden_size, dtype=dtype),
            },
        }
    return {
        "embeddings": {
            "token_embedding": layers.init_embedding(next(ks), cfg.vocab_size, cfg.hidden_size, dtype),
            "position_embedding": layers.init_embedding(
                next(ks), cfg.max_position_embeddings, cfg.hidden_size, dtype
            ),
        },
        "encoder": {"layers": lyrs},
        "final_layer_norm": layers.init_norm(cfg.hidden_size, dtype),
    }


# ---------------------------------------------------------------------------
# SD 1.5-style TextEncoder (reference models/clip/clip.py) — same math as the
# config-driven tower above, but with the v1 param naming so v1 checkpoints
# (and the demo stack's CompVis .ckpt remap) load without aliasing.
# ---------------------------------------------------------------------------


def text_encoder_v1_apply(params, input_ids, cfg: Optional[CLIPTextConfig] = None,
                          *, impl: str = "auto", dtype=jnp.float32) -> jax.Array:
    """Reference TextEncoder.forward (clip.py:28-34), v1 naming:
    text_embedding.{embedding,position_embedding}, encoder_layers.{i}.
    {layernorm_1,self_attn,ffn.0,ffn.2,layernorm_2}, final_layer_norm."""
    cfg = cfg or CLIPTextConfig.vit_l()
    emb = params["text_embedding"]
    seq = input_ids.shape[-1]
    x = layers.embedding(emb["embedding"], input_ids)
    x = x + emb["position_embedding"]["embedding"][:seq]
    x = x.astype(dtype)
    for i in range(cfg.num_hidden_layers):
        p = params["encoder_layers"][str(i)]
        res = x
        h = layers.layer_norm(p["layernorm_1"], x, eps=cfg.layer_norm_eps)
        h = multihead_attention(
            p["self_attn"], h, num_heads=cfg.num_attention_heads, causal=True, impl=impl
        )
        x = h + res
        res = x
        h = layers.layer_norm(p["layernorm_2"], x, eps=cfg.layer_norm_eps)
        h = layers.linear(p["ffn"]["0"], h)
        h = layers.quick_gelu(h)
        h = layers.linear(p["ffn"]["2"], h)
        x = h + res
    return layers.layer_norm(params["final_layer_norm"], x, eps=cfg.layer_norm_eps)


def init_text_encoder_v1(key, cfg: Optional[CLIPTextConfig] = None, dtype=jnp.float32):
    cfg = cfg or CLIPTextConfig.vit_l()
    ks = iter(jax.random.split(key, 3 + cfg.num_hidden_layers))
    lyrs = {}
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(next(ks), 3)
        lyrs[str(i)] = {
            "layernorm_1": layers.init_norm(cfg.hidden_size, dtype),
            "self_attn": init_multihead_attention(lk[0], cfg.hidden_size, dtype=dtype),
            "layernorm_2": layers.init_norm(cfg.hidden_size, dtype),
            "ffn": {
                "0": layers.init_linear(lk[1], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
                "2": layers.init_linear(lk[2], cfg.intermediate_size, cfg.hidden_size, dtype=dtype),
            },
        }
    return {
        "text_embedding": {
            "embedding": layers.init_embedding(next(ks), cfg.vocab_size, cfg.hidden_size, dtype),
            "position_embedding": layers.init_embedding(
                next(ks), cfg.max_position_embeddings, cfg.hidden_size, dtype
            ),
        },
        "encoder_layers": lyrs,
        "final_layer_norm": layers.init_norm(cfg.hidden_size, dtype),
    }


# ---------------------------------------------------------------------------
# CLIP vision tower + CLIP-score (evaluation support).
#
# The reference computes CLIP-score through torchmetrics' CLIP wrapper
# (evaluation.py:21-31, commented out and torchmetrics-dependent); we
# implement the full scoring model natively: a ViT image tower + the text /
# visual projections of HF CLIPModel, so evaluation runs on TPU with no
# torch dependency.  Param naming mirrors HF CLIPModel state_dict
# (vision_model.*, visual_projection, text_projection, logit_scale).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, data: dict) -> "CLIPVisionConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def vision_model_apply(params, pixel_values: jax.Array, cfg: CLIPVisionConfig,
                       *, impl: str = "auto") -> jax.Array:
    """(B, H, W, 3) normalized pixels -> pooled (B, hidden) (post-LN CLS).

    Mirrors HF CLIPVisionTransformer: patch conv (no bias) + class embedding
    + position embeddings, pre-LN ("pre_layrnorm" — HF's typo), N non-causal
    layers, post-LN on the CLS token.
    """
    emb = params["embeddings"]
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values,
        emb["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(emb["class_embedding"].astype(pixel_values.dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + emb["position_embedding"]["embedding"][: x.shape[1]].astype(x.dtype)
    x = layers.layer_norm(params["pre_layrnorm"], x, eps=cfg.layer_norm_eps)
    for i in range(cfg.num_hidden_layers):
        # same pre-LN block as the text tower, without the causal mask
        p = params["encoder"]["layers"][str(i)]
        res = x
        h = layers.layer_norm(p["layer_norm1"], x, eps=cfg.layer_norm_eps)
        h = multihead_attention(p["self_attn"], h, num_heads=cfg.num_attention_heads, impl=impl)
        x = h + res
        res = x
        h = layers.layer_norm(p["layer_norm2"], x, eps=cfg.layer_norm_eps)
        h = _mlp(p["mlp"], h, _act(cfg.hidden_act))
        x = h + res
    pooled = x[:, 0]
    return layers.layer_norm(params["post_layernorm"], pooled, eps=cfg.layer_norm_eps)


def clip_image_embed(params, pixel_values, vcfg: CLIPVisionConfig, *, impl="auto"):
    pooled = vision_model_apply(params["vision_model"], pixel_values, vcfg, impl=impl)
    return layers.linear(params["visual_projection"], pooled)


def clip_text_embed(params, input_ids, tcfg: CLIPTextConfig, *, impl="auto"):
    """Pooled text embedding: hidden state at the EOT token (argmax of ids,
    the original-CLIP convention) through text_projection."""
    hidden = text_model_apply(params["text_model"], input_ids, tcfg, impl=impl)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(hidden, eot[:, None, None], axis=1)[:, 0]
    return layers.linear(params["text_projection"], pooled)


def clip_score(params, pixel_values, input_ids, vcfg: CLIPVisionConfig,
               tcfg: CLIPTextConfig, *, impl="auto") -> jax.Array:
    """torchmetrics-compatible CLIP score: 100 * max(cos_sim, 0) per pair.

    pixel_values: (B, H, W, 3) raw [0, 255] images — CLIP normalization is
    applied here."""
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], pixel_values.dtype)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], pixel_values.dtype)
    px = (pixel_values / 255.0 - mean) / std
    img = clip_image_embed(params, px, vcfg, impl=impl)
    txt = clip_text_embed(params, input_ids, tcfg, impl=impl)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return jnp.maximum(jnp.sum(img * txt, axis=-1), 0.0) * 100.0


def init_vision_model(key, cfg: CLIPVisionConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 4 + cfg.num_hidden_layers))
    lyrs = {}
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(next(ks), 3)
        lyrs[str(i)] = {
            "layer_norm1": layers.init_norm(cfg.hidden_size, dtype),
            "self_attn": init_multihead_attention(lk[0], cfg.hidden_size, dtype=dtype),
            "layer_norm2": layers.init_norm(cfg.hidden_size, dtype),
            "mlp": {
                "fc1": layers.init_linear(lk[1], cfg.hidden_size, cfg.intermediate_size, dtype=dtype),
                "fc2": layers.init_linear(lk[2], cfg.intermediate_size, cfg.hidden_size, dtype=dtype),
            },
        }
    return {
        "embeddings": {
            "class_embedding": jax.random.normal(next(ks), (cfg.hidden_size,), dtype),
            "patch_embedding": {
                "kernel": jax.random.normal(
                    next(ks), (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size), dtype
                )
                * 0.02
            },
            "position_embedding": layers.init_embedding(
                next(ks), cfg.num_patches + 1, cfg.hidden_size, dtype
            ),
        },
        "pre_layrnorm": layers.init_norm(cfg.hidden_size, dtype),
        "encoder": {"layers": lyrs},
        "post_layernorm": layers.init_norm(cfg.hidden_size, dtype),
    }


# ---------------------------------------------------------------------------
# ClassEncoder (reference models/clip/clip.py:96-102)
# ---------------------------------------------------------------------------


def class_encoder_apply(params, labels: jax.Array) -> jax.Array:
    return layers.embedding(params["embedding"], labels)


def init_class_encoder(key, num_classes: int, emb_dim: int = 768, dtype=jnp.float32):
    return {"embedding": layers.init_embedding(key, num_classes + 1, emb_dim, dtype)}
