"""VAE latent autoencoder + VQ-VAE variant.

Functional re-design of the reference VAE (models/vae/vae.py:134-377,
models/vae/resnet.py:5-39): NHWC, name-preserving param tree
(encoder.down_blocks.{i}.resnets.{j}..., mid_block.{resnets,attentions},
quant_conv, post_quant_conv, decoder.up_blocks...).

Behavioral notes carried over deliberately:
  * Downsample uses the asymmetric (0,1,0,1) pad + stride-2 VALID conv
    (reference vae.py:20-29).
  * ``encode`` reproduces the reference's 0.18215 asymmetry (vae.py:251-267):
    the latent is scaled by 0.18215 only when no explicit noise is supplied;
    ``decode`` always divides by 0.18215.  (diffusers always scales — the
    reference's img2img path depends on the unscaled variant.)
  * Mid attention is single-head over h*w tokens at the full channel dim
    (512), param names {group_norm, query, key, value, proj_attn}
    (vae.py:42-132).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.ops.attention import sdpa

SD_LATENT_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4  # z_channels
    base_channels: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    norm_eps: float = 1e-6

    @classmethod
    def from_dict(cls, data: dict) -> "VAEConfig":
        """Parse a diffusers ``vae/config.json``.  Topology fields are honored:
        ``block_out_channels`` sets base_channels/ch_mult; values the fixed
        2-resnet-per-stage encoder / 3-per-stage decoder cannot realize
        (``layers_per_block`` != 2, ``norm_num_groups`` != 32) raise instead of
        silently building the wrong network."""
        kw = dict(
            in_channels=data.get("in_channels", 3),
            out_channels=data.get("out_channels", 3),
            latent_channels=data.get("latent_channels", 4),
        )
        boc = data.get("block_out_channels")
        if boc is not None:
            base = int(boc[0])
            if base <= 0 or any(int(c) % base for c in boc):
                raise ValueError(
                    f"unsupported block_out_channels={boc}: stages must be "
                    f"integer multiples of the first ({base})"
                )
            kw["base_channels"] = base
            kw["ch_mult"] = tuple(int(c) // base for c in boc)
        lpb = int(data.get("layers_per_block", 2))
        if lpb != 2:
            raise ValueError(
                f"layers_per_block={lpb} unsupported: the VAE topology is "
                "2 encoder resnets / 3 decoder resnets per stage "
                "(reference vae.py:134-239)"
            )
        ng = int(data.get("norm_num_groups", 32))
        if ng != 32:
            raise ValueError(
                f"norm_num_groups={ng} unsupported: GroupNorm(32) is fixed "
                "throughout (reference vae.py:134-239)"
            )
        return cls(**kw)


def _residual_block(params, x: jax.Array, *, eps: float = 1e-6, impl: str = "auto") -> jax.Array:
    """GN-SiLU-conv x2 + optional 1x1 shortcut (reference resnet.py:5-39);
    param names {norm1, conv1, norm2, conv2[, conv_shortcut]}.  On TPU each
    GN-SiLU-conv runs as the fused Pallas pipeline (ops/conv.py)."""
    from stable_diffusion_tpu.ops.conv import gn_silu_conv3x3

    h = gn_silu_conv3x3(params["norm1"], params["conv1"], x, eps=eps, impl=impl)
    h = gn_silu_conv3x3(params["norm2"], params["conv2"], h, eps=eps, impl=impl)
    if "conv_shortcut" in params:
        x = layers.conv2d(params["conv_shortcut"], x)
    return h + x


def _mid_attention(params, x: jax.Array, *, impl: str = "auto") -> jax.Array:
    """Single-head channel-dim attention over spatial tokens
    (reference vae.py:42-132).  x: NHWC."""
    b, h_, w_, c = x.shape
    xn = layers.group_norm(params["group_norm"], x, eps=1e-6)
    tokens = xn.reshape(b, h_ * w_, c)
    q = layers.linear(params["query"], tokens)[:, :, None, :]
    k = layers.linear(params["key"], tokens)[:, :, None, :]
    v = layers.linear(params["value"], tokens)[:, :, None, :]
    out = sdpa(q, k, v, impl=impl)[:, :, 0, :]
    out = layers.linear(params["proj_attn"], out)
    return out.reshape(b, h_, w_, c) + x


def encoder_apply(params, x: jax.Array, cfg: VAEConfig = VAEConfig(), *, impl: str = "auto") -> jax.Array:
    """Image NHWC (B,H,W,3) -> moments (B,H/8,W/8,2*z) (reference vae.py:170-185)."""
    h = layers.conv2d(params["conv_in"], x)
    n = len(cfg.ch_mult)
    for i in range(n):
        stage = params["down_blocks"][str(i)]
        for j in ("0", "1"):
            h = _residual_block(stage["resnets"][j], h, impl=impl)
        if i != n - 1:
            h = layers.conv2d(
                stage["downsamplers"]["0"]["conv"], h, stride=2, padding=((0, 1), (0, 1))
            )
    mid = params["mid_block"]
    h = _residual_block(mid["resnets"]["0"], h, impl=impl)
    h = _mid_attention(mid["attentions"]["0"], h, impl=impl)
    h = _residual_block(mid["resnets"]["1"], h, impl=impl)
    h = layers.group_norm(params["conv_norm_out"], h, eps=cfg.norm_eps)
    h = layers.silu(h)
    return layers.conv2d(params["conv_out"], h)


def decoder_apply(params, z: jax.Array, cfg: VAEConfig = VAEConfig(), *, impl: str = "auto") -> jax.Array:
    """Latent NHWC (B,h,w,z) -> image (B,8h,8w,3) in [-1,1] (reference vae.py:230-239)."""
    h = layers.conv2d(params["conv_in"], z)
    mid = params["mid_block"]
    h = _residual_block(mid["resnets"]["0"], h, impl=impl)
    h = _mid_attention(mid["attentions"]["0"], h, impl=impl)
    h = _residual_block(mid["resnets"]["1"], h, impl=impl)
    n = len(cfg.ch_mult)
    for u in range(n):  # up_blocks stored deepest-first (reversed ch_mult)
        stage = params["up_blocks"][str(u)]
        for j in ("0", "1", "2"):
            h = _residual_block(stage["resnets"][j], h, impl=impl)
        if u != n - 1:
            h = layers.upsample_nearest_2x(h)
            from stable_diffusion_tpu.ops.conv import conv3x3

            h = conv3x3(stage["upsamplers"]["0"]["conv"], h, impl=impl)
    h = layers.group_norm(params["conv_norm_out"], h, eps=cfg.norm_eps)
    h = layers.silu(h)
    return layers.conv2d(params["conv_out"], h)


def encode_moments(
    params,
    x: jax.Array,
    cfg: VAEConfig = VAEConfig(),
    *,
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Deterministic half of ``encode``: image NHWC -> (mean, stdev), each
    (B,H/8,W/8,z) (reference vae.py:251-259).  Exposed separately so a frozen
    VAE's per-image moments can be computed ONCE and cached by the trainer —
    the only stochastic piece of the encode is the reparameterization noise."""
    moments = encoder_apply(params["encoder"], x, cfg, impl=impl)
    moments = layers.conv2d(params["quant_conv"], moments)
    mean, log_var = jnp.split(moments, 2, axis=-1)
    log_var = jnp.clip(log_var, -30.0, 20.0)
    return mean, jnp.exp(0.5 * log_var)


def encode(
    params,
    x: jax.Array,
    cfg: VAEConfig = VAEConfig(),
    *,
    noise: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reparameterized encode -> (latent, mean, stdev) (reference vae.py:251-267).

    When ``noise`` is None a sample is drawn from ``key`` and the latent is
    scaled by 0.18215 (the reference's txt2img-internal convention); with an
    explicit ``noise`` the latent is returned UNscaled (img2img path).
    """
    mean, stdev = encode_moments(params, x, cfg, impl=impl)
    if noise is not None:
        out = mean + stdev * noise
    else:
        assert key is not None, "encode() needs either noise= or key="
        out = mean + stdev * jax.random.normal(key, stdev.shape, stdev.dtype)
        out = out * SD_LATENT_SCALE
    return out, mean, stdev


def decode(params, z: jax.Array, cfg: VAEConfig = VAEConfig(), *, impl: str = "auto") -> jax.Array:
    """Latent -> image in [-1,1] (reference vae.py:270-274)."""
    z = z / SD_LATENT_SCALE
    z = layers.conv2d(params["post_quant_conv"], z)
    return decoder_apply(params["decoder"], z, cfg, impl=impl)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_residual_block(key, in_ch, out_ch, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": layers.init_norm(in_ch, dtype),
        "conv1": layers.init_conv2d(ks[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": layers.init_norm(out_ch, dtype),
        "conv2": layers.init_conv2d(ks[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = layers.init_conv2d(ks[2], in_ch, out_ch, 1, dtype=dtype)
    return p


def _init_mid(key, ch, dtype):
    ks = jax.random.split(key, 6)
    return {
        "resnets": {
            "0": _init_residual_block(ks[0], ch, ch, dtype),
            "1": _init_residual_block(ks[1], ch, ch, dtype),
        },
        "attentions": {
            "0": {
                "group_norm": layers.init_norm(ch, dtype),
                "query": layers.init_linear(ks[2], ch, ch, dtype=dtype),
                "key": layers.init_linear(ks[3], ch, ch, dtype=dtype),
                "value": layers.init_linear(ks[4], ch, ch, dtype=dtype),
                "proj_attn": layers.init_linear(ks[5], ch, ch, dtype=dtype),
            }
        },
    }


def init_encoder(key, cfg: VAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    ch = cfg.base_channels
    in_mult = (1,) + cfg.ch_mult
    down = {}
    for i in range(len(cfg.ch_mult)):
        block_in, block_out = ch * in_mult[i], ch * cfg.ch_mult[i]
        stage = {
            "resnets": {
                "0": _init_residual_block(next(keys), block_in, block_out, dtype),
                "1": _init_residual_block(next(keys), block_out, block_out, dtype),
            }
        }
        if i != len(cfg.ch_mult) - 1:
            stage["downsamplers"] = {
                "0": {"conv": layers.init_conv2d(next(keys), block_out, block_out, 3, dtype=dtype)}
            }
        down[str(i)] = stage
    top = ch * cfg.ch_mult[-1]
    return {
        "conv_in": layers.init_conv2d(next(keys), cfg.in_channels, ch, 3, dtype=dtype),
        "down_blocks": down,
        "mid_block": _init_mid(next(keys), top, dtype),
        "conv_norm_out": layers.init_norm(top, dtype),
        "conv_out": layers.init_conv2d(next(keys), top, 2 * cfg.latent_channels, 3, dtype=dtype),
    }


def init_decoder(key, cfg: VAEConfig, dtype=jnp.float32, z_channels: Optional[int] = None):
    keys = iter(jax.random.split(key, 64))
    ch = cfg.base_channels
    z = cfg.latent_channels if z_channels is None else z_channels
    block_in = ch * cfg.ch_mult[-1]
    up = {}
    for u, i in enumerate(reversed(range(len(cfg.ch_mult)))):
        block_out = ch * cfg.ch_mult[i]
        stage = {
            "resnets": {
                "0": _init_residual_block(next(keys), block_in, block_out, dtype),
                "1": _init_residual_block(next(keys), block_out, block_out, dtype),
                "2": _init_residual_block(next(keys), block_out, block_out, dtype),
            }
        }
        if i != 0:
            stage["upsamplers"] = {
                "0": {"conv": layers.init_conv2d(next(keys), block_out, block_out, 3, dtype=dtype)}
            }
        up[str(u)] = stage
        block_in = block_out
    return {
        "conv_in": layers.init_conv2d(next(keys), z, ch * cfg.ch_mult[-1], 3, dtype=dtype),
        "mid_block": _init_mid(next(keys), ch * cfg.ch_mult[-1], dtype),
        "up_blocks": up,
        "conv_norm_out": layers.init_norm(ch, dtype),
        "conv_out": layers.init_conv2d(next(keys), ch, cfg.out_channels, 3, dtype=dtype),
    }


def init_vae(key, cfg: VAEConfig = VAEConfig(), dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    z = cfg.latent_channels
    return {
        "encoder": init_encoder(ks[0], cfg, dtype),
        "decoder": init_decoder(ks[1], cfg, dtype),
        "quant_conv": layers.init_conv2d(ks[2], 2 * z, 2 * z, 1, dtype=dtype),
        "post_quant_conv": layers.init_conv2d(ks[3], z, z, 1, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# VQ-VAE variant (reference vae.py:291-377) — codebook nearest-neighbor
# quantization with straight-through estimator and optional EMA codebook.
# ---------------------------------------------------------------------------


def vqvae_encode(params, x: jax.Array, cfg: VAEConfig = VAEConfig()):
    """Returns (quantized NHWC, quantize_loss, min_indices (B,h,w)).

    Nearest-code lookup is an argmin over squared distances (the reference's
    torch.cdist + argmin, vae.py:306-312), with the straight-through gradient
    copy and vq + commitment losses (vae.py:330-344).
    """
    z = encoder_apply(params["encoder"], x, cfg)
    b, h, w, c = z.shape
    flat = z.reshape(-1, c)
    codebook = params["quant_embedding"]["embedding"]  # (K, c)
    d = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * flat @ codebook.T
        + jnp.sum(codebook**2, axis=1)[None, :]
    )
    idx = jnp.argmin(d, axis=-1)
    quant = codebook[idx]
    vq_loss = jnp.mean((jax.lax.stop_gradient(flat) - quant) ** 2)
    commit_loss = jnp.mean((flat - jax.lax.stop_gradient(quant)) ** 2)
    quant = flat + jax.lax.stop_gradient(quant - flat)  # straight-through
    return quant.reshape(b, h, w, c), vq_loss + commit_loss, idx.reshape(b, h, w)


def vqvae_decode(params, z: jax.Array, cfg: VAEConfig = VAEConfig()):
    return decoder_apply(params["decoder"], z, cfg)


def vqvae_ema_codebook_update(params, ema_state, min_indices, encoder_out, *, beta=0.995):
    """EMA codebook update (reference vae.py:361-377), as a pure function:
    state = {"N": (K,), "M": (K, c)}; returns (new_params, new_state)."""
    codebook = params["quant_embedding"]["embedding"]
    k, c = codebook.shape
    flat_idx = min_indices.reshape(-1)
    flat_z = encoder_out.reshape(-1, c)
    onehot = jax.nn.one_hot(flat_idx, k, dtype=flat_z.dtype)
    n_new = beta * ema_state["N"] + (1 - beta) * jnp.sum(onehot, axis=0)
    m_new = beta * ema_state["M"] + (1 - beta) * (onehot.T @ flat_z)
    new_codebook = m_new / jnp.maximum(n_new[:, None], 1e-8)
    new_params = dict(params)
    new_params["quant_embedding"] = {"embedding": new_codebook}
    return new_params, {"N": n_new, "M": m_new}


def init_vqvae(key, cfg: VAEConfig = VAEConfig(), codebook_size: int = 1024, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    z2 = cfg.latent_channels * 2
    return {
        "encoder": init_encoder(ks[0], cfg, dtype),
        "decoder": init_decoder(ks[1], cfg, dtype, z_channels=z2),
        "quant_embedding": layers.init_embedding(ks[2], codebook_size, z2, dtype),
    }
