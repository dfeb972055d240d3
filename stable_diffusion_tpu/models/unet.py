"""Config-driven UNet denoiser (SD 1.5 / 2.1 topology).

Functional re-design of the reference UNet (models/unet/unet.py:15-461):

  * NHWC activations, HWIO conv kernels, params as a name-preserving pytree
    whose key paths mirror the reference module names (encoder.down.{i}.
    block.{j}.{k}..., bottleneck.{0,1,2}, decoder.up.{i}..., output.{0,2}).
  * The whole forward is trace-static: the decoder's "upsample unless the
    next skip has the same spatial dim" rule (reference unet.py:346-349) is
    evaluated on concrete trace-time shapes, so it compiles to a fixed graph.
  * The reference hardcodes the bottleneck at 1280 channels (unet.py:383-391);
    we use ``block_out_channels[-1]`` (the intended behavior), which is
    identical for every real SD config and lets tiny test configs build.
  * Attention-head bookkeeping follows the reference (unet.py:364-371):
    ``num_attention_heads`` defaults to ``attention_head_dim`` (the diffusers
    legacy quirk where SD's "head_dim" list is really the head count).

Timestep embedding uses the cos-then-sin concat (flip_sin_to_cos=True
diffusers convention; reference unet.py:197-220).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.models.attention import multihead_attention, init_multihead_attention
from stable_diffusion_tpu.ops import conv as conv_ops


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors the diffusers unet/config.json surface the reference parses
    (models/unet/unet.py:15-61) — with a usable default ctor (reference
    quirk 2.12.10 fixed: default_factory lists)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    attention_head_dim: Union[int, tuple] = (5, 10, 20, 20)
    num_attention_heads: Optional[Union[int, tuple]] = None
    cross_attention_dim: Union[int, tuple] = 1024
    down_block_types: tuple = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    t_embed_dim: int = 320
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    sample_size: int = 96

    @classmethod
    def from_dict(cls, data: dict) -> "UNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: (tuple(v) if isinstance(v, list) else v) for k, v in data.items() if k in known}
        return cls(**kw)

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls(attention_head_dim=8, cross_attention_dim=768)

    @classmethod
    def sd21(cls) -> "UNetConfig":
        return cls()

    # -- derived, normalized views -------------------------------------
    @property
    def num_stages(self) -> int:
        return len(self.block_out_channels)

    @property
    def heads_per_stage(self) -> tuple:
        h = self.num_attention_heads if self.num_attention_heads is not None else self.attention_head_dim
        return tuple([h] * self.num_stages) if isinstance(h, int) else tuple(h)

    @property
    def cross_dim_per_stage(self) -> tuple:
        c = self.cross_attention_dim
        return tuple([c] * self.num_stages) if isinstance(c, int) else tuple(c)

    @property
    def stage_has_attention(self) -> tuple:
        return tuple(t == "CrossAttnDownBlock2D" for t in self.down_block_types)

    @property
    def time_embed_dim(self) -> int:
        return self.t_embed_dim * 4


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def sinusoidal_time_embedding(timestep: jax.Array, dim: int) -> jax.Array:
    """cos-then-sin sinusoid (reference unet.py:211-218). timestep: (B,)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(jnp.float32(10000.0)) * jnp.arange(half, dtype=jnp.float32) / half
    )
    x = timestep.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=-1)


def time_embedding_apply(params, timestep: jax.Array, cfg: UNetConfig, dtype) -> jax.Array:
    """(B,) int timesteps -> (B, 4*t_embed_dim) (reference unet.py:197-220)."""
    t = sinusoidal_time_embedding(timestep, cfg.t_embed_dim).astype(dtype)
    t = layers.linear(params["ffn"]["0"], t)
    t = layers.silu(t)
    return layers.linear(params["ffn"]["2"], t)


def resblock_apply(params, x: jax.Array, t_embed: jax.Array, *, eps: float,
                   impl: str = "auto") -> jax.Array:
    """GN-SiLU-conv + time-proj add + GN-SiLU-conv + shortcut
    (reference unet.py:153-195).  x: NHWC; t_embed: (B or 1, 4*t_dim).
    On TPU the GN+SiLU+conv3x3 pattern runs as one fused Pallas pipeline
    (ops/conv.py: stats kernel + normalize folded into the conv's im2col)."""
    from stable_diffusion_tpu.ops.conv import gn_silu_conv3x3

    h = gn_silu_conv3x3(params["groupnorm_1"], params["conv_1"], x, eps=eps, impl=impl)

    time = layers.silu(t_embed)
    time = layers.linear(params["t_embed"], time)
    h = h + time[:, None, None, :]

    h = gn_silu_conv3x3(params["groupnorm_2"], params["conv_2"], h, eps=eps, impl=impl)

    if "proj_input" in params:
        pi = params["proj_input"]
        if "kernel" in pi:
            # 1x1 shortcut == matmul; the +h residual fuses into it
            from stable_diffusion_tpu.ops import linear as fl

            b_, hh, ww, ci = x.shape
            co = h.shape[-1]
            y = fl.matmul_residual(
                x.reshape(b_, hh * ww, ci), pi["kernel"][0, 0],
                pi.get("bias"), h.reshape(b_, hh * ww, co), impl=impl,
            )
            return y.reshape(h.shape)
        x = layers.conv2d(pi, x)
    return h + x


def attention_block_apply(params, x, cond, *, num_heads: int, impl: str) -> jax.Array:
    """Pre-LN self-attn -> pre-LN cross-attn -> pre-LN GeGLU FFN, all residual
    (reference unet.py:93-150).  x: (B, S, C); cond: (B, 77, cross_dim)."""
    # pre-LN and residual adds are folded into the projection matmuls on TPU
    # (ops/linear.py via multihead_attention's ln_params/residual args)
    x = multihead_attention(
        params["attn1"], x, num_heads=num_heads, impl=impl,
        ln_params=params["layernorm_1"], residual=x,
    )
    x = multihead_attention(
        params["attn2"], x, num_heads=num_heads, cond=cond, impl=impl,
        ln_params=params["layernorm_2"], residual=x,
    )

    from stable_diffusion_tpu.ops.ffn import geglu_ffn

    # LN + GeGLU-FFN + residual as ONE fused kernel on TPU (ops/ffn.py)
    return geglu_ffn(
        params["ffn"], x, ln_params=params["layernorm_3"], residual=x, impl=impl
    )


def transformer_encoder_apply(params, x, cond, *, num_heads: int, impl: str) -> jax.Array:
    """Spatial transformer: GN(eps 1e-6) -> 1x1 conv -> tokens -> attention
    block -> 1x1 conv -> +residual (reference unet.py:62-91).  x: NHWC."""
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu

    b, h_, w_, c = x.shape
    res = x
    pi = params["conv_input"]
    if "kernel" in pi:
        # GN normalize fused into the 1x1 conv_input matmul (ops/linear.py);
        # stats stay on the Pallas streaming kernel
        from stable_diffusion_tpu.ops import linear as fl

        x = fl.gn_matmul(
            params["groupnorm"], x, pi["kernel"][0, 0],
            pi.get("bias"), eps=1e-6, impl=impl,
        )
    else:
        x = group_norm_silu(params["groupnorm"], x, eps=1e-6, silu=False, impl=impl)
        x = layers.conv2d(pi, x)
    x = x.reshape(b, h_ * w_, c)
    x = attention_block_apply(params["transformer_block"], x, cond, num_heads=num_heads, impl=impl)
    # 1x1 conv_output == matmul; the +residual fuses into it (ops/linear.py)
    po = params["conv_output"]
    if "kernel" in po:
        from stable_diffusion_tpu.ops import linear as fl

        x = fl.matmul_residual(
            x, po["kernel"][0, 0].astype(x.dtype),
            po["bias"] if "bias" in po else None,
            res.reshape(b, h_ * w_, c), impl=impl,
        )
        return x.reshape(b, h_, w_, c)
    x = x.reshape(b, h_, w_, c)
    x = layers.conv2d(po, x)
    return x + res


def _block_apply(params, x, t_embed, cond, *, num_heads, eps, impl, remat=False):
    """One SwitcSequential unit: ResBlock then optional TransformerEncoder.

    ``remat=True`` rematerializes the whole unit in the backward pass — the
    TPU analog of the reference's per-attention torch.utils.checkpoint
    (unet.py:130-141), trading FLOPs for HBM.
    """
    def run(params, x, t_embed, cond):
        x = resblock_apply(params["0"], x, t_embed, eps=eps, impl=impl)
        if "1" in params:
            x = transformer_encoder_apply(params["1"], x, cond, num_heads=num_heads, impl=impl)
        return x

    if remat:
        return jax.checkpoint(run)(params, x, t_embed, cond)
    return run(params, x, t_embed, cond)


# ---------------------------------------------------------------------------
# Full UNet
# ---------------------------------------------------------------------------


def unet_apply(
    params,
    x: jax.Array,
    timestep: jax.Array,
    cond: jax.Array,
    cfg: UNetConfig,
    *,
    impl: str = "auto",
    remat: bool = False,
) -> jax.Array:
    """UNet forward (reference unet.py:431-443).

    x: (B, H, W, in_channels) NHWC latents; timestep: (B,) or (1,);
    cond: (B, 77, cross_dim) text embedding.  Returns epsilon/v prediction.
    """
    dtype = x.dtype
    heads = cfg.heads_per_stage
    has_attn = cfg.stage_has_attention
    n = cfg.num_stages
    eps = cfg.norm_eps

    t_embed = time_embedding_apply(params["time_embedding"], timestep, cfg, dtype)

    # ----- encoder (reference unet.py:284-295) -----
    enc = params["encoder"]
    h = layers.conv2d(enc["conv_in"], x)
    skips = [h]
    for i in range(n):
        stage = enc["down"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _block_apply(
                stage["block"][str(j)], h, t_embed, cond,
                num_heads=heads[i], eps=eps, impl=impl, remat=remat,
            )
            skips.append(h)
        if i != n - 1:
            h = layers.conv2d(stage["downsample"]["conv"], h, stride=2, padding=1)
            skips.append(h)

    # ----- bottleneck (reference unet.py:383-391) -----
    mid = params["bottleneck"]
    h = resblock_apply(mid["0"], h, t_embed, eps=eps, impl=impl)
    h = transformer_encoder_apply(mid["1"], h, cond, num_heads=heads[-1], impl=impl)
    h = resblock_apply(mid["2"], h, t_embed, eps=eps, impl=impl)

    # ----- decoder (reference unet.py:337-351) -----
    dec = params["decoder"]
    for u, i in enumerate(reversed(range(n))):
        stage = dec["up"][str(u)]
        prev_hw = skips[-1].shape[2]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _block_apply(
                stage["block"][str(j)], h, t_embed, cond,
                num_heads=heads[i], eps=eps, impl=impl, remat=remat,
            )
        if i != 0:
            # upsample unless the next skip is at the current resolution
            # (static at trace time — shapes are concrete under jit)
            if not (skips and skips[-1].shape[2] == prev_hw):
                h = layers.upsample_nearest_2x(h)
            h = conv_ops.conv3x3(stage["upsample"]["conv"], h, impl=impl)

    # ----- output head (reference unet.py:398-401) -----
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu

    out = params["output"]
    h = group_norm_silu(out["0"], h, eps=eps, silu=True, impl=impl)
    return layers.conv2d(out["2"], h)


# ---------------------------------------------------------------------------
# DeepCache-style split forward (block caching: arXiv 2312.03209 /
# DeepCache).  The UNet's deep trunk (stages 1..n-1 + bottleneck + all but
# the last decoder stage) changes slowly across adjacent timesteps; caching
# it and recomputing only the highest-resolution stage trades a small
# approximation for skipping ~half the FLOPs on cached steps.  Opt-in via
# pipeline.generate(deepcache_interval=k).
# ---------------------------------------------------------------------------


def unet_shallow_encoder(params, x, t_embed, cond, cfg: UNetConfig, *, impl="auto"):
    """conv_in + stage-0 blocks -> (stage0 skips [conv_in, b0, b1], down0)."""
    heads = cfg.heads_per_stage
    eps = cfg.norm_eps
    enc = params["encoder"]
    h = layers.conv2d(enc["conv_in"], x)
    skips = [h]
    stage = enc["down"]["0"]
    for j in range(cfg.layers_per_block):
        h = _block_apply(
            stage["block"][str(j)], h, t_embed, cond,
            num_heads=heads[0], eps=eps, impl=impl,
        )
        skips.append(h)
    down0 = layers.conv2d(stage["downsample"]["conv"], h, stride=2, padding=1)
    return skips, down0


def unet_deep(params, down0, t_embed, cond, cfg: UNetConfig, *, impl="auto"):
    """Stages 1..n-1 + bottleneck + decoder stages up to (not including) the
    last one.  Consumes down0 as its final skip; returns the 64x64-resolution
    feature entering the last decoder stage."""
    heads = cfg.heads_per_stage
    eps = cfg.norm_eps
    n = cfg.num_stages
    enc = params["encoder"]

    h = down0
    skips = [down0]
    for i in range(1, n):
        stage = enc["down"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _block_apply(
                stage["block"][str(j)], h, t_embed, cond,
                num_heads=heads[i], eps=eps, impl=impl,
            )
            skips.append(h)
        if i != n - 1:
            h = layers.conv2d(stage["downsample"]["conv"], h, stride=2, padding=1)
            skips.append(h)

    mid = params["bottleneck"]
    h = resblock_apply(mid["0"], h, t_embed, eps=eps, impl=impl)
    h = transformer_encoder_apply(mid["1"], h, cond, num_heads=heads[-1], impl=impl)
    h = resblock_apply(mid["2"], h, t_embed, eps=eps, impl=impl)

    dec = params["decoder"]
    for u, i in enumerate(reversed(range(1, n))):
        stage = dec["up"][str(u)]
        prev_hw = skips[-1].shape[2]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _block_apply(
                stage["block"][str(j)], h, t_embed, cond,
                num_heads=heads[i], eps=eps, impl=impl,
            )
        if not (skips and skips[-1].shape[2] == prev_hw):
            h = layers.upsample_nearest_2x(h)
        h = conv_ops.conv3x3(stage["upsample"]["conv"], h, impl=impl)
    return h


def unet_shallow_decoder(params, deep_h, skips, t_embed, cond, cfg: UNetConfig, *, impl="auto"):
    """Last decoder stage (consumes the stage-0 skips) + output head."""
    heads = cfg.heads_per_stage
    eps = cfg.norm_eps
    n = cfg.num_stages
    stage = params["decoder"]["up"][str(n - 1)]
    h = deep_h
    skips = list(skips)
    for j in range(cfg.layers_per_block + 1):
        skip = skips.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        h = _block_apply(
            stage["block"][str(j)], h, t_embed, cond,
            num_heads=heads[0], eps=eps, impl=impl,
        )
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu

    out = params["output"]
    h = group_norm_silu(out["0"], h, eps=eps, silu=True, impl=impl)
    return layers.conv2d(out["2"], h)


def unet_apply_split(params, x, timestep, cond, cfg: UNetConfig, *, impl="auto"):
    """Full forward through the split functions -> (output, deep feature).
    Composition equals unet_apply exactly (tested)."""
    t_embed = time_embedding_apply(params["time_embedding"], timestep, cfg, x.dtype)
    skips, down0 = unet_shallow_encoder(params, x, t_embed, cond, cfg, impl=impl)
    deep_h = unet_deep(params, down0, t_embed, cond, cfg, impl=impl)
    out = unet_shallow_decoder(params, deep_h, skips, t_embed, cond, cfg, impl=impl)
    return out, deep_h


def unet_apply_cached(params, x, timestep, cond, deep_h, cfg: UNetConfig, *, impl="auto"):
    """Cached-step forward: recompute only the shallow stage, reuse deep_h."""
    t_embed = time_embedding_apply(params["time_embedding"], timestep, cfg, x.dtype)
    skips, _ = unet_shallow_encoder(params, x, t_embed, cond, cfg, impl=impl)
    return unet_shallow_decoder(params, deep_h, skips, t_embed, cond, cfg, impl=impl)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_resblock(key, in_ch, out_ch, t_dim, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "groupnorm_1": layers.init_norm(in_ch, dtype),
        "conv_1": layers.init_conv2d(ks[0], in_ch, out_ch, 3, dtype=dtype),
        "t_embed": layers.init_linear(ks[1], t_dim, out_ch, dtype=dtype),
        "groupnorm_2": layers.init_norm(out_ch, dtype),
        "conv_2": layers.init_conv2d(ks[2], out_ch, out_ch, 3, dtype=dtype),
    }
    if in_ch != out_ch:
        p["proj_input"] = layers.init_conv2d(ks[3], in_ch, out_ch, 1, dtype=dtype)
    return p


def _init_transformer(key, channels, cond_dim, dtype):
    ks = jax.random.split(key, 6)
    return {
        "groupnorm": layers.init_norm(channels, dtype),
        "conv_input": layers.init_conv2d(ks[0], channels, channels, 1, dtype=dtype),
        "transformer_block": {
            "layernorm_1": layers.init_norm(channels, dtype),
            "attn1": init_multihead_attention(ks[1], channels, qkv_bias=False, dtype=dtype),
            "layernorm_2": layers.init_norm(channels, dtype),
            "attn2": init_multihead_attention(
                ks[2], channels, cond_dim=cond_dim, qkv_bias=False, dtype=dtype
            ),
            "layernorm_3": layers.init_norm(channels, dtype),
            "ffn": {
                "0": {"proj": layers.init_linear(ks[3], channels, channels * 8, dtype=dtype)},
                "1": layers.init_linear(ks[4], channels * 4, channels, dtype=dtype),
            },
        },
        "conv_output": layers.init_conv2d(ks[5], channels, channels, 1, dtype=dtype),
    }


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32):
    """Random init with the reference topology (for tests / from-scratch)."""
    bc = list(cfg.block_out_channels)
    n = cfg.num_stages
    heads = cfg.heads_per_stage
    cross = cfg.cross_dim_per_stage
    has_attn = cfg.stage_has_attention
    t_dim = cfg.time_embed_dim
    keys = iter(jax.random.split(key, 1024))

    def block(in_ch, out_ch, stage):
        p = {"0": _init_resblock(next(keys), in_ch, out_ch, t_dim, dtype)}
        if has_attn[stage]:
            p["1"] = _init_transformer(next(keys), out_ch, cross[stage], dtype)
        return p

    # encoder
    block_in = [bc[0]] + bc
    down = {}
    for i in range(n):
        stage = {"block": {}}
        chans = [block_in[i]] + [bc[i]] * (cfg.layers_per_block - 1)
        for j in range(cfg.layers_per_block):
            stage["block"][str(j)] = block(chans[j] if j == 0 else bc[i], bc[i], i)
        if i != n - 1:
            stage["downsample"] = {"conv": layers.init_conv2d(next(keys), bc[i], bc[i], 3, dtype=dtype)}
        down[str(i)] = stage
    encoder = {
        "conv_in": layers.init_conv2d(next(keys), cfg.in_channels, bc[0], 3, dtype=dtype),
        "down": down,
    }

    # bottleneck
    mid_ch = bc[-1]
    bottleneck = {
        "0": _init_resblock(next(keys), mid_ch, mid_ch, t_dim, dtype),
        "1": _init_transformer(next(keys), mid_ch, cross[-1], dtype),
        "2": _init_resblock(next(keys), mid_ch, mid_ch, t_dim, dtype),
    }

    # decoder (reference unet.py:297-335 channel bookkeeping)
    dec_in = bc + [bc[-1]]
    up = {}
    for u, i in enumerate(reversed(range(n))):
        in_ch = dec_in[i + 1]
        out_ch = bc[i]
        mid_in = dec_in[i - 1] if i > 0 else bc[0]
        stage = {"block": {}}
        ins = [in_ch + out_ch, out_ch + out_ch, out_ch + mid_in]
        for j in range(cfg.layers_per_block + 1):
            stage["block"][str(j)] = block(ins[j], out_ch, i)
        if i != 0:
            stage["upsample"] = {"conv": layers.init_conv2d(next(keys), out_ch, out_ch, 3, dtype=dtype)}
        up[str(u)] = stage
    decoder = {"up": up}

    return {
        "time_embedding": {
            "ffn": {
                "0": layers.init_linear(next(keys), cfg.t_embed_dim, t_dim, dtype=dtype),
                "2": layers.init_linear(next(keys), t_dim, t_dim, dtype=dtype),
            }
        },
        "encoder": encoder,
        "bottleneck": bottleneck,
        "decoder": decoder,
        "output": {
            "0": layers.init_norm(bc[0], dtype),
            "2": layers.init_conv2d(next(keys), bc[0], cfg.out_channels, 3, dtype=dtype),
        },
    }
