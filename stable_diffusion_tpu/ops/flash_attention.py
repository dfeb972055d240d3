"""Pallas TPU flash attention (inference hot path).

TPU-native replacement for the reference's optional ``flash_attn`` CUDA wheel
(reference models/unet/attention.py:52-67).  Online-softmax blockwise
attention: grid is (batch*heads, q_blocks, kv_blocks) with the kv dimension
innermost; running max / normalizer / accumulator live in VMEM scratch that
persists across sequential grid steps, so HBM traffic is one pass over Q, K,
V and one write of O — no S x S logits materialized.

Covers the UNet/VAE self-attention shapes (seq in {64..4096} multiples of the
block size, head_dim {64, 128, 256, 512}).  Cross-attention with 77-token
text keys and the 77-token causal text towers are left to the XLA path —
their logits are tiny and XLA fuses them well.

Gradients flow through a recompute-based custom VJP (XLA backward), so the
kernel is usable inside the training step too.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _pick_blocks(seq: int, head_dim: int):
    bq = 512 if head_dim <= 128 else 128
    bk = 1024 if head_dim <= 128 else 256
    return min(bq, seq), min(bk, seq)


def _padded_dim(d: int) -> int:
    """Head dims are zero-padded up to a lane-friendly size (SD 1.5 uses
    40/80/160; zero dims contribute nothing to logits or outputs)."""
    for t in (64, 128, 256, 512):
        if d <= t:
            return t
    return 0


def supported(q: jax.Array, k: jax.Array) -> bool:
    """True when the Pallas kernel covers this shape (non-causal self-attn)."""
    if q.ndim != 4 or k.ndim != 4:
        return False
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq != sk:
        return False  # cross-attn with 77-token text keys -> XLA path
    dp = _padded_dim(d)
    if dp == 0:
        return False
    bq, bk = _pick_blocks(sq, dp)
    return sq % bq == 0 and sk % bk == 0 and sq >= 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale: float):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # keep matmul operands in their storage dtype (bf16): the MXU runs
    # bf16 x bf16 -> f32 at full rate; upcasting inputs to f32 first would
    # drop it ~8x.  Softmax statistics stay f32.
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, BK) f32

    m_prev = m_ref[:, 0:1]  # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (BQ, BK) f32
    alpha = jnp.exp(m_prev - m_new)  # (BQ, 1)

    l_new = l_ref[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


def _flash_bhsd(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float) -> jax.Array:
    """q, k, v: (BH, S, D) -> (BH, S, D)."""
    bh, s, d = q.shape
    bq, bk = _pick_blocks(s, d)
    grid = (bh, s // bq, s // bk)
    kernel = functools.partial(_flash_kernel, scale=scale)
    flops = 4 * bh * s * s * d
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(3 * bh * s * d + bh * s * d) * q.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    b, s, h, d = q.shape
    dp = _padded_dim(d)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    if dp != d:
        pad = [(0, 0), (0, 0), (0, dp - d)]
        qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))
    o = _flash_bhsd(qt, kt, vt, scale=scale)
    if dp != d:
        o = o[..., :d]
    return o.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _xla_ref(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * jnp.float32(scale), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


def _flash_fwd(q, k, v, scale):
    return _flash(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    # Recompute-based backward: differentiate the XLA reference formulation.
    # Numerically equivalent; trades HBM for FLOPs like jax.checkpoint.
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_ref(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Flash attention over (B, S, H, D) tensors.  Non-causal self-attn only."""
    if causal:
        raise NotImplementedError("causal shapes route to the XLA path")
    if not supported(q, k):
        raise ValueError(f"unsupported flash shape q={q.shape} k={k.shape}")
    d = q.shape[-1]
    return _flash(q, k, v, d ** -0.5 if scale is None else scale)
