"""Fused GeGLU FFN Pallas kernel (the transformer block's MLP hot path).

The reference computes GeGLU as proj-to-8C, chunk, x1 * gelu(gate), then a
4C->C linear (models/activation_fn.py:12-20, models/unet/unet.py:127-150).
As two XLA dots that materializes an (M, 8C) intermediate in HBM — e.g.
(8192, 2560) bf16 = 42 MB written + (M, 4C) read back per layer.  This
kernel pipelines both matmuls through VMEM:

    for each (m, n) block:               # n blocks the 4C hidden dim
        hv = x_m @ W1[:, n_value]        # (BM, BN)   value half
        hg = x_m @ W1[:, n_gate]         # (BM, BN)   gate half
        h  = (hv + bv) * gelu(hg + bg)   # VPU, f32
        acc_m += h @ W2[n]               # (BM, C)
    out_m = acc_m + b2                   # on the last n block

so the 8C intermediate never touches HBM, and x_m is read once per n block
from VMEM (not per-matmul from HBM).  Weights stream through the normal
BlockSpec pipeline; all SD stage widths (C in {320, 640, 1280}; 4C up to
5120) have 128-multiple blocks.

Backward falls back to the XLA formulation via custom VJP (recompute, like
ops/conv.py) so the kernel is usable inside the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7) — Mosaic
    has no erf/erfc lowering; exp is supported.  1.5e-7 is far below the
    bf16 output quantization (~4e-3 relative), so the kernel still matches
    the exact-GELU XLA path bit-comparably in bf16."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    # torch nn.GELU() default == exact erf formulation (models/layers.gelu)
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


def _ffn_kernel(x_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref, w2_ref, b2_ref,
                o_ref, acc_ref):
    n = pl.program_id(1)
    nn = pl.num_programs(1)

    x = x_ref[...]
    hv = jnp.dot(x, w1v_ref[...], preferred_element_type=jnp.float32)
    hg = jnp.dot(x, w1g_ref[...], preferred_element_type=jnp.float32)
    h = (hv + b1v_ref[...]) * _gelu_f32(hg + b1g_ref[...])
    part = jnp.dot(h.astype(x.dtype), w2_ref[...],
                   preferred_element_type=jnp.float32)

    @pl.when(n == 0)
    def _first():
        acc_ref[...] = part

    @pl.when(n > 0)
    def _rest():
        acc_ref[...] = acc_ref[...] + part

    @pl.when(n == nn - 1)
    def _store():
        o_ref[...] = (acc_ref[...] + b2_ref[...]).astype(o_ref.dtype)


def _pick_blocks(m: int, c: int, hidden: int, itemsize: int):
    """(bm, bn) under a VMEM budget with Mosaic's double buffering of every
    streamed block.  Returns (0, 0) if nothing fits."""
    budget = 13 * 1024 * 1024
    for bn in (1280, 1024, 640, 512, 256, 128):
        if bn > hidden or hidden % bn:
            continue
        for bm in (512, 256, 128):
            if bm > m or m % bm:
                continue
            wt = 2 * (2 * c * bn + bn * c) * itemsize      # w1v+w1g+w2, 2-buf
            xb = 2 * bm * c * itemsize                     # x block, 2-buf
            ob = 2 * bm * c * itemsize
            acc = bm * c * 4
            tmp = 3 * bm * bn * 4                          # hv, hg, h
            if wt + xb + ob + acc + tmp <= budget:
                return bm, bn
    return 0, 0


def supported(x: jax.Array, w1: jax.Array) -> bool:
    """x: (B, S, C); w1: (C, 2*hidden)."""
    if x.ndim != 3 or w1.ndim != 2:
        return False
    b, s, c = x.shape
    hidden = w1.shape[1] // 2
    if w1.shape[0] != c or w1.shape[1] != 2 * hidden:
        return False
    # bn slices the hidden dim into 128-multiple blocks (MXU/lane alignment);
    # C itself only needs sublane alignment — Mosaic pads the lane dim of the
    # (bm, C) / (bn, C) blocks internally (C = 320 = 2.5 lanes is fine).
    if c % 8 or hidden % 128:
        return False
    # Measured envelope (benchmarks/microbench_ffn.py, diff-timed on v5e):
    # the kernel wins at C in {320, 640} for every M (b2: 186 vs 279 us at
    # stage0; b8: 747 vs 1076; 768^2: 421 vs 589) and LOSES at C = 1280
    # (186 vs 149 us) where the 39 MB weight slab must re-stream per m-block
    # under the VMEM budget while XLA re-uses it — keep stage2 on XLA.
    if c > 640:
        return False
    m = b * s
    if m % 128:
        return False
    bm, bn = _pick_blocks(m, c, hidden, x.dtype.itemsize)
    return bm > 0


def _ffn_call(x2, w1v, w1g, b1v, b1g, w2, b2, *, bm, bn):
    m, c = x2.shape
    hidden = w2.shape[0]
    grid = (m // bm, hidden // bn)
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, n: (i, 0)),
            pl.BlockSpec((c, bn), lambda i, n: (0, n)),
            pl.BlockSpec((c, bn), lambda i, n: (0, n)),
            pl.BlockSpec((1, bn), lambda i, n: (0, n)),
            pl.BlockSpec((1, bn), lambda i, n: (0, n)),
            pl.BlockSpec((bn, c), lambda i, n: (n, 0)),
            pl.BlockSpec((1, c), lambda i, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, n: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * 3 * hidden,
            bytes_accessed=(2 * m * c + 3 * c * hidden) * x2.dtype.itemsize,
            transcendentals=m * hidden,
        ),
    )(x2, w1v, w1g, b1v, b1g, w2, b2)


def _ffn_xla(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=x.dtype) + b1.astype(x.dtype)
    x1, gate = jnp.split(h, 2, axis=-1)
    h = x1 * _gelu_f32(gate.astype(jnp.float32)).astype(x.dtype)
    return jnp.dot(h, w2.astype(x.dtype), preferred_element_type=x.dtype) + b2.astype(x.dtype)


@jax.custom_vjp
def _ffn(x, w1, b1, w2, b2):
    b, s, c = x.shape
    hidden = w2.shape[0]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    w1v, w1g = w1[:, :hidden], w1[:, hidden:]
    b1f = b1.astype(jnp.float32)
    b1v, b1g = b1f[:hidden].reshape(1, hidden), b1f[hidden:].reshape(1, hidden)
    b2f = b2.astype(jnp.float32).reshape(1, c)
    x2 = x.reshape(b * s, c)
    bm, bn = _pick_blocks(b * s, c, hidden, x.dtype.itemsize)
    out = _ffn_call(x2, w1v, w1g, b1v, b1g, w2, b2f, bm=bm, bn=bn)
    return out.reshape(b, s, c)


def _ffn_fwd(x, w1, b1, w2, b2):
    return _ffn(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ffn_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_ffn_xla, x, w1, b1, w2, b2)
    return vjp(g)


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def geglu_ffn(ffn_params, x: jax.Array, *, impl: str = "auto") -> jax.Array:
    """The attention block's FFN: GeGLU proj + output linear.

    ``ffn_params``: {"0": {"proj": linear}, "1": linear} (reference
    unet.py:127-150 naming).  Pallas-fused on TPU for covered shapes; the
    quantized (int8) and uncovered forms fall back to the layer path.
    """
    from stable_diffusion_tpu.models import layers

    p0, p1 = ffn_params["0"]["proj"], ffn_params["1"]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    want = impl in ("pallas", "flash") or (impl == "auto" and on_tpu)
    if (want and "kernel" in p0 and "kernel" in p1
            and "bias" in p0 and "bias" in p1
            and supported(x, p0["kernel"])):
        return _ffn(x, p0["kernel"], p0["bias"], p1["kernel"], p1["bias"])
    h = layers.geglu(ffn_params["0"], x)
    return layers.linear(p1, h)
