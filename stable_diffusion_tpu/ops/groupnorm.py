"""Fused GroupNorm(+SiLU) Pallas kernel.

The UNet applies GroupNorm ~60 times per denoise step (reference ResBlocks
GN-SiLU-conv x2, unet.py:153-195, and the spatial-transformer GN,
unet.py:62-91).  The XLA lowering computes statistics in f32 with reshapes
and materializes intermediates; this kernel keeps the activation in bf16 in
VMEM and fuses normalize + affine + SiLU into one pass:

  * per-channel sums via a ones-row matmul (MXU, f32 accumulation) — no
    sublane reduction trees;
  * channel<->group reductions/broadcasts via a tiny (C, G) group-indicator
    matmul, so the lane dim never needs an awkward C/G reshape;
  * one grid step per batch element (UNet activations fit VMEM); shapes too
    large for VMEM (e.g. VAE decoding at 512^2) fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float,
               silu: bool):
    x = x_ref[0]  # (HW, C) bf16
    hw, c = x.shape
    g = num_groups
    per = c // g

    # group-indicator matrix M[c, g] = 1 iff channel c belongs to group g
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    m = (ci // per == gi).astype(jnp.float32)

    ones = jnp.ones((8, hw), jnp.float32)  # 8 sublanes for tiling; row 0 used
    s1 = jax.lax.dot_general(
        ones, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[0:1]  # (1, C)
    s2 = jax.lax.dot_general(
        ones, x * x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[0:1]

    n = jnp.float32(hw * per)
    gmean = (s1 @ m) / n  # (1, G)
    gvar = (s2 @ m) / n - gmean * gmean
    inv = jax.lax.rsqrt(gvar + eps)

    mean_c = gmean @ m.T  # (1, C)
    inv_c = inv @ m.T

    scale = scale_ref[0].astype(jnp.float32) * inv_c[0]  # (C,)
    shift = bias_ref[0].astype(jnp.float32) - mean_c[0] * scale
    y = x.astype(jnp.float32) * scale[None, :] + shift[None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _fits(hw: int, c: int, itemsize: int) -> bool:
    return hw * c * (2 * itemsize + 4) < _VMEM_BUDGET


def group_norm_silu(
    params,
    x: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
    impl: str = "auto",
) -> jax.Array:
    """Fused GN(+SiLU) over NHWC; falls back to the XLA path off-TPU or when
    the activation exceeds the VMEM budget."""
    from stable_diffusion_tpu.models import layers

    b = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d

    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_kernel = impl in ("pallas", "flash") or (impl == "auto" and on_tpu)
    if not use_kernel or not _fits(hw, c, x.dtype.itemsize) or hw % 8:
        y = layers.group_norm(params, x, num_groups=num_groups, eps=eps)
        return layers.silu(y) if silu else y

    xf = x.reshape(b, hw, c)
    kernel = functools.partial(_gn_kernel, num_groups=num_groups, eps=eps, silu=silu)
    scale = params["scale"].reshape(1, c)
    bias = params["bias"].reshape(1, c)
    y = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * hw * c,
            bytes_accessed=2 * b * hw * c * x.dtype.itemsize,
            transcendentals=b * hw * c if silu else 0,
        ),
    )(xf, scale, bias)
    return y.reshape(x.shape)
