"""Int8 weight quantization primitives (TPU-native).

Replaces the reference's torch.ao dynamic int8 quantization
(utils/quantize_model.py:11-52, qnnpack engine): we quantize linear kernels
to int8 with per-output-channel scales; dequantization is a convert+multiply
that XLA fuses into the consuming matmul, so the HBM read is int8 (2x less
weight bandwidth than bf16, 4x less than f32) while the MXU computes in the
activation dtype.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_tensor(w: jax.Array, *, axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8: returns (q int8, scale f32 broadcastable)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_tensor(q: jax.Array, scale: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)
