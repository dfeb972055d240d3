"""Scaled dot-product attention: XLA path + Pallas flash-attention dispatch.

Replaces both reference attention paths (F.scaled_dot_product_attention and
the ``flash_attn`` CUDA wheel, reference models/unet/attention.py:37-67) with
a single entry point.  Layout is (batch, seq, heads, head_dim) throughout —
no (B, H, S, D) permutes; XLA/Mosaic tile the head dim onto lanes directly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Reference einsum attention with f32 softmax accumulation.

    q: (B, Sq, H, D); k, v: (B, Sk, H, D).  Returns (B, Sq, H, D).
    """
    d = q.shape[-1]
    scale = d ** -0.5 if scale is None else scale
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        # torch is_causal aligns the mask to the bottom-right for Sq != Sk;
        # all reference uses have Sq == Sk so the simple form suffices.
        mask = qi + (sk - sq) >= ki
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=v.dtype
    )
    return out


def _flash_supported(q: jax.Array, k: jax.Array) -> bool:
    from stable_diffusion_tpu.ops import flash_attention as fa

    return fa.supported(q, k)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Scaled dot-product attention.

    impl:
      "xla"   — pure-jnp einsum path (CPU / parity tests)
      "flash" — Pallas TPU flash-attention kernel (errors if unsupported shape)
      "auto"  — flash on TPU when the shape is supported, else XLA
    """
    if impl == "xla":
        return _xla_sdpa(q, k, v, causal=causal, scale=scale)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_flash = (impl == "flash" or (impl == "auto" and on_tpu)) and not causal
    if use_flash and _flash_supported(q, k):
        from stable_diffusion_tpu.ops import flash_attention as fa

        return fa.flash_attention(q, k, v, causal=causal, scale=scale)
    return _xla_sdpa(q, k, v, causal=causal, scale=scale)
