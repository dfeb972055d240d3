"""Fused (LayerNorm ->) matmul (-> +bias -> +residual) Pallas kernel.

The transformer blocks surround every attention projection with elementwise
XLA work: pre-LN before the QKV projection (reference models/unet/unet.py:
127-150), a residual add after the output projection, and the same pattern
around the spatial transformer's 1x1 conv_output.  As separate XLA ops each
LN costs an extra read+write of the (M, C) activation for its stats +
normalize passes, the residual another read+write, and the matmuls get
scheduled between Pallas custom-calls where XLA's dot fusions have been
measured well below their standalone rates (BASELINE.md round-2/3 notes).

This kernel runs the whole chain through VMEM once:

    x_m' = LN(x_m)                  # optional, f32 stats in-kernel
    out_mn = x_m' @ W[:, n] + b[n] (+ res_mn)   # f32 MXU accumulation

Layout: m-outer grid (m blocks stream, K fully resident per block); the
weight's n blocks stream inside.  The x block's index map is constant across
n, so Mosaic skips its re-DMA; the LN prologue recomputes per n block (VPU,
negligible next to the dot).

Backward is a recompute-based custom VJP through the XLA formulation (like
ops/ffn.py), so the kernel is usable inside the training step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


def _make_kernel(has_ln: bool, has_res: bool, has_bias: bool, eps: float):
    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        if has_ln:
            g_ref, be_ref = refs[i], refs[i + 1]; i += 2
        w_ref = refs[i]; i += 1
        if has_bias:
            b_ref = refs[i]; i += 1
        res_ref = None
        if has_res:
            res_ref = refs[i]; i += 1
        o_ref = refs[i]

        x = x_ref[...]
        if has_ln:
            x = _ln_f32(x, g_ref[...].astype(jnp.float32),
                        be_ref[...].astype(jnp.float32), eps)
        acc = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        if has_bias:
            acc = acc + b_ref[...]
        if has_res:
            acc = acc + res_ref[...].astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


def _plan(m: int, k: int, n: int, itemsize: int):
    """(bm, bn) under the VMEM budget, or (0, 0) if infeasible.

    bn = n (single weight block, Mosaic pads the lane tail internally —
    e.g. n = 320, proven by the FFN kernel's C=320 out blocks) is tried
    first; otherwise bn must be a 128-multiple divisor of n."""
    budget = 13 * 1024 * 1024
    for bn in (n, 2048, 1024, 512, 256, 128):
        if bn > n or n % bn or (bn != n and bn % 128):
            continue
        for bm in (512, 256, 128):
            if bm > m or m % bm:
                continue
            x_b = 2 * bm * k * itemsize
            w_b = 2 * k * bn * itemsize
            o_b = 2 * bm * bn * itemsize
            r_b = 2 * bm * bn * itemsize
            tmp = bm * max(k, bn) * 4
            if x_b + w_b + o_b + r_b + tmp <= budget:
                return bm, bn
    return 0, 0


def fused_mm_enabled() -> bool:
    """bf16 fused-matmul dispatch mode (SD_TPU_FUSED_MM):

    - "0" (DEFAULT): every bf16 fused-mm site (LN-matmul, matmul+residual,
      GN-matmul) uses the plain XLA formulation.
    - "envelope": only sites inside the standalone-measured win envelope
      (see _site_wins).
    - "all"/"1": every geometrically feasible site.

    Round-3 on-chip verdict (why the default is OFF): the e2e A/B measured
    all-sites-on a clear NET LOSS (txt2img b1 0.955 vs 1.026 img/s XLA-only;
    one-step b32 12.1 vs 14.2), and the refined envelope bought nothing
    beyond run noise (b1 1.016, b4 1.103 — equal to XLA-only).  XLA already
    fuses LN/residual elementwise into its dots; the Pallas win shows up
    standalone (microbench_linear.py: 2.4x on the n=320 out-projection) but
    is erased in-program by layout transitions at the custom-call
    boundaries.  The kernels stay for re-measurement on future
    toolchains/topologies.

    The W8A8 fused variants are NOT gated by this — they won on-chip
    (e2e b4 static 1.208 fused vs 1.152 unfused; SD_TPU_Q_FUSED hatch).
    """
    return os.environ.get("SD_TPU_FUSED_MM", "0") != "0"


def _site_wins(site: str, m: int, k: int, n: int) -> bool:
    """Standalone-measured bf16 win envelope per fusion site (round-3
    benchmarks/microbench_linear.py chained differentials; used only under
    SD_TPU_FUSED_MM=envelope — see fused_mm_enabled for the e2e verdict):

    - ln_qkv (LN prologue): XLA wins at every honest data point (b8 s4096
      c320: XLA 0.091 ms vs kernel 0.321) — always off.
    - matmul+residual: kernel wins standalone on narrow outputs (n=320:
      0.020 vs 0.049 ms at m=8192; 0.086 vs 0.107 at m=32768) and on
      small-M/large-K 1x1 convs (m=128, k=2048, n=1280: 0.005 vs 0.008);
      loses mid-stage (m=2048, k=1024, n=640: 0.049 vs 0.014).
    - gn_matmul: wins only at the deep stage (m=512, k=n=1280: 0.012 vs
      0.023 ms).
    """
    mode = os.environ.get("SD_TPU_FUSED_MM", "0")
    if mode in ("all", "1"):
        return True
    if site == "ln":
        return False
    if site == "res":
        return n <= 384 or (m <= 512 and k >= 2048)
    if site == "gn":
        return k >= 1280
    return True


def supported(m: int, k: int, n: int, itemsize: int = 2) -> bool:
    if not fused_mm_enabled():
        return False
    if m % 128 or n % 8 or k % 8:
        return False
    return _plan(m, k, n, itemsize) != (0, 0)


def _mm_call(x2, ln, w, b, res2, *, eps):
    m, k = x2.shape
    n = w.shape[1]
    bm, bn = _plan(m, k, n, x2.dtype.itemsize)
    has_ln = ln is not None
    has_res = res2 is not None
    has_bias = b is not None

    grid = (m // bm, n // bn)
    midx = lambda i, j: (i, 0)
    nidx = lambda i, j: (0, j)
    oidx = lambda i, j: (i, j)

    inputs = [x2]
    specs = [pl.BlockSpec((bm, k), midx)]
    if has_ln:
        inputs += [ln[0].reshape(1, k), ln[1].reshape(1, k)]
        specs += [pl.BlockSpec((1, k), lambda i, j: (0, 0))] * 2
    inputs.append(w)
    specs.append(pl.BlockSpec((k, bn), nidx))
    if has_bias:
        inputs.append(b.reshape(1, n))
        specs.append(pl.BlockSpec((1, bn), nidx))
    if has_res:
        inputs.append(res2)
        specs.append(pl.BlockSpec((bm, bn), oidx))

    kernel = _make_kernel(has_ln, has_res, has_bias, eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, bn), oidx),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + k * n + 2 * m * n) * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(*inputs)


def _mm_xla(x, gamma, beta, w, b, res, eps):
    from stable_diffusion_tpu.models import layers

    h = x
    if gamma is not None:
        h = layers.layer_norm({"scale": gamma, "bias": beta}, x, eps=eps)
    y = jnp.dot(h, w.astype(h.dtype), preferred_element_type=h.dtype)
    if b is not None:
        y = y + b.astype(h.dtype)
    if res is not None:
        y = y + res
    return y


def _mm_impl(x, gamma, beta, w, b, res, eps):
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.shape[1]
    x2 = x.reshape(-1, k)
    ln = None
    if gamma is not None:
        ln = (gamma.astype(jnp.float32), beta.astype(jnp.float32))
    bf = None if b is None else b.astype(jnp.float32)
    res2 = None if res is None else res.reshape(-1, n)
    out = _mm_call(x2, ln, w.astype(x.dtype), bf, res2, eps=eps)
    return out.reshape(*lead, n)


# Arity-stable custom-vjp wrappers (custom_vjp can't take optional array
# args) — callers synthesize a zero bias when absent; geometry is checked by
# the caller via ``supported``.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ln_mm(x, gamma, beta, w, b, eps):
    return _mm_impl(x, gamma, beta, w, b, None, eps)


def _ln_mm_fwd(x, gamma, beta, w, b, eps):
    return _ln_mm(x, gamma, beta, w, b, eps), (x, gamma, beta, w, b)


def _ln_mm_bwd(eps, saved, g):
    x, gamma, beta, w, b = saved
    _, vjp = jax.vjp(
        lambda *a: _mm_xla(*a, None, eps), x, gamma, beta, w, b
    )
    return vjp(g)


_ln_mm.defvjp(_ln_mm_fwd, _ln_mm_bwd)


@jax.custom_vjp
def _mm_res(x, w, b, res):
    return _mm_impl(x, None, None, w, b, res, 1e-5)


def _mm_res_fwd(x, w, b, res):
    return _mm_res(x, w, b, res), (x, w, b, res)


def _mm_res_bwd(saved, g):
    x, w, b, res = saved
    _, vjp = jax.vjp(
        lambda x_, w_, b_, r_: _mm_xla(x_, None, None, w_, b_, r_, 1e-5),
        x, w, b, res,
    )
    return vjp(g)


_mm_res.defvjp(_mm_res_fwd, _mm_res_bwd)


# ---------------------------------------------------------------------------
# GroupNorm-prologue matmul: the spatial transformer's GN -> 1x1 conv_input
# (reference unet.py:73-80).  GN stats come from the streaming Pallas stats
# kernel (ops/groupnorm.gn_scale_shift, (B, 2, C) folded affine); the
# normalize pass fuses into the matmul prologue so the normalized activation
# never round-trips HBM.
# ---------------------------------------------------------------------------


def _gn_mm_kernel(x_ref, ss_ref, w_ref, b_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    xn = (x * ss_ref[0, 0][None, :] + ss_ref[0, 1][None, :]).astype(o_ref.dtype)
    acc = jnp.dot(xn, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...]).astype(o_ref.dtype)


def _gn_plan(m: int, s: int, k: int, n: int, itemsize: int):
    """Like _plan but bm must divide the per-image row count s so each m
    block reads exactly one batch element's (2, C) stats."""
    budget = 13 * 1024 * 1024
    for bn in (n, 2048, 1024, 512, 256, 128):
        if bn > n or n % bn or (bn != n and bn % 128):
            continue
        for bm in (512, 256, 128):
            if bm > m or m % bm or s % bm:
                continue
            x_b = 2 * bm * k * itemsize
            w_b = 2 * k * bn * itemsize
            o_b = 2 * bm * bn * itemsize
            tmp = bm * max(k, bn) * 4 + bm * k * 4
            if x_b + w_b + o_b + tmp <= budget:
                return bm, bn
    return 0, 0


def gn_supported(m: int, s: int, k: int, n: int, itemsize: int = 2) -> bool:
    if not fused_mm_enabled():
        return False
    if m % 128 or n % 8 or k % 8:
        return False
    return _gn_plan(m, s, k, n, itemsize) != (0, 0)


def _gn_mm_call(x2, ss, w, b, *, s):
    m, k = x2.shape
    n = w.shape[1]
    bm, bn = _gn_plan(m, s, k, n, x2.dtype.itemsize)
    rows_per_img = s // bm

    grid = (m // bm, n // bn)
    inputs = [x2, ss, w, b.reshape(1, n)]
    specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        pl.BlockSpec((1, 2, k), lambda i, j: (i // rows_per_img, 0, 0)),
        pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
    ]
    return pl.pallas_call(
        _gn_mm_kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + k * n + 2 * m * n) * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(*inputs)


def _gn_mm_xla(gamma, beta, x, w, b, num_groups, eps):
    from stable_diffusion_tpu.models import layers

    xn = layers.group_norm({"scale": gamma, "bias": beta}, x,
                           num_groups=num_groups, eps=eps)
    return jnp.dot(xn, w.astype(xn.dtype), preferred_element_type=xn.dtype) \
        + b.astype(xn.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gn_mm(gamma, beta, x, w, b, num_groups, eps):
    """x: (B, H, W, K) NHWC -> (B, H, W, N); GN over K fused into the dot."""
    from stable_diffusion_tpu.ops.groupnorm import gn_scale_shift

    bsz = x.shape[0]
    k = x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    ss = gn_scale_shift({"scale": gamma, "bias": beta}, x,
                        num_groups=num_groups, eps=eps)
    out = _gn_mm_call(x.reshape(bsz * s, k), ss, w.astype(x.dtype),
                      b.astype(jnp.float32), s=s)
    return out.reshape(*x.shape[:-1], w.shape[1])


def _gn_mm_fwd(gamma, beta, x, w, b, num_groups, eps):
    return _gn_mm(gamma, beta, x, w, b, num_groups, eps), (gamma, beta, x, w, b)


def _gn_mm_bwd(num_groups, eps, saved, g):
    gamma, beta, x, w, b = saved
    _, vjp = jax.vjp(
        lambda *a: _gn_mm_xla(*a, num_groups, eps), gamma, beta, x, w, b
    )
    return vjp(g)


_gn_mm.defvjp(_gn_mm_fwd, _gn_mm_bwd)


# ---------------------------------------------------------------------------
# Static-W8A8 fused matmul: (LN ->) quantize-to-int8 -> int8 x int8 -> int32
# MXU dot (double rate) -> dequant (+bias) (+residual).  The activation scale
# folds into the LN affine (gamma/s, beta/s) or a (1,1) VMEM scalar so the
# quantize happens on VPU registers — the int8 activation never exists in
# HBM, unlike the XLA path's separate quantize pass.
# Inference-only: the VJP raises (round/clip gradients would be silently
# wrong), matching ops/conv._conv3x3_q.
# ---------------------------------------------------------------------------


def _make_q_kernel(has_ln: bool, has_res: bool, eps: float):
    def kernel(*refs):
        i = 0
        x_ref = refs[i]; i += 1
        if has_ln:
            g_ref, be_ref = refs[i], refs[i + 1]; i += 2
        else:
            sinv_ref = refs[i]; i += 1
        wq_ref, ws_ref, b_ref = refs[i:i + 3]; i += 3
        res_ref = None
        if has_res:
            res_ref = refs[i]; i += 1
        o_ref = refs[i]

        if has_ln:
            # gamma/beta arrive pre-divided by the act scale, so the LN
            # output IS the quantizer input
            xs = _ln_f32(x_ref[...].astype(jnp.float32),
                         g_ref[...], be_ref[...], eps)
        else:
            xs = x_ref[...].astype(jnp.float32) * sinv_ref[0, 0]
        xq = jnp.round(jnp.clip(xs, -127.0, 127.0)).astype(jnp.int8)
        acc = jnp.dot(xq, wq_ref[...], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * ws_ref[...] + b_ref[...]
        if has_res:
            y = y + res_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    return kernel


def _q_plan(m: int, k: int, n: int, itemsize: int):
    budget = 13 * 1024 * 1024
    for bn in (n, 2048, 1024, 512, 256, 128):
        if bn > n or n % bn or (bn != n and bn % 128):
            continue
        for bm in (512, 256, 128):
            if bm > m or m % bm:
                continue
            x_b = 2 * bm * k * itemsize
            w_b = 2 * k * bn  # int8
            o_b = 2 * bm * bn * itemsize
            tmp = bm * k * 4 + bm * k + bm * bn * 4
            if x_b + w_b + 2 * o_b + tmp <= budget:
                return bm, bn
    return 0, 0


def q_fused_enabled() -> bool:
    """SD_TPU_Q_FUSED=0 reverts every fused-W8A8 site (here AND ops/ffn.py)
    to the XLA int8 dots — safety hatch: the in-kernel f32->int8 quantize is
    the one Mosaic pattern the earlier int8 conv kernel did not already
    prove on-chip."""
    return os.environ.get("SD_TPU_Q_FUSED", "1") != "0"


def q_supported(m: int, k: int, n: int, itemsize: int = 2) -> bool:
    if not q_fused_enabled():
        return False
    if m % 128 or n % 8 or k % 32:
        return False
    return _q_plan(m, k, n, itemsize) != (0, 0)


def _q_mm_call(x2, ln, sinv, wq, ws, b, res2, *, eps):
    m, k = x2.shape
    n = wq.shape[1]
    bm, bn = _q_plan(m, k, n, x2.dtype.itemsize)
    has_ln = ln is not None
    has_res = res2 is not None

    grid = (m // bm, n // bn)
    inputs = [x2]
    specs = [pl.BlockSpec((bm, k), lambda i, j: (i, 0))]
    if has_ln:
        inputs += [ln[0].reshape(1, k), ln[1].reshape(1, k)]
        specs += [pl.BlockSpec((1, k), lambda i, j: (0, 0))] * 2
    else:
        inputs.append(sinv.reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0)))
    inputs += [wq, ws.reshape(1, n), b.reshape(1, n)]
    specs += [
        pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
    ]
    if has_res:
        inputs.append(res2)
        specs.append(pl.BlockSpec((bm, bn), lambda i, j: (i, j)))

    return pl.pallas_call(
        _make_q_kernel(has_ln, has_res, eps),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * x2.dtype.itemsize + k * n + 2 * m * n * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(*inputs)


def _q_mm_xla(x, gamma, beta, act_scale, wq, ws, b, res, eps):
    from stable_diffusion_tpu.models import layers

    h = x
    if gamma is not None:
        h = layers.layer_norm({"scale": gamma, "bias": beta}, x, eps=eps)
    s_x = act_scale.astype(jnp.float32) / 127.0
    hq = jnp.round(
        jnp.clip(h.astype(jnp.float32) / s_x, -127.0, 127.0)
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, wq, (((hq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(jnp.float32) * (s_x * ws.reshape(1, -1))).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    if res is not None:
        y = y + res
    return y


def _q_raise_bwd(*a, **k):
    raise NotImplementedError(
        "W8A8 fused matmul is inference-only: gradients through the int8 "
        "round/clip quantizer would be silently wrong — train in bf16 and "
        "quantize afterwards (utils/quantize_model)"
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _q_mm(x, gamma, beta, act_scale, wq, ws, b, eps, res):
    """LN -> quantize -> int8 dot -> dequant (+res).  gamma/beta given."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[1]
    s_x = act_scale.astype(jnp.float32) / 127.0
    ln = (gamma.astype(jnp.float32) / s_x, beta.astype(jnp.float32) / s_x)
    ws_f = s_x * ws.astype(jnp.float32).reshape(1, n)
    bf = (b if b is not None else jnp.zeros((n,), jnp.float32)).astype(jnp.float32)
    res2 = None if res is None else res.reshape(-1, n)
    out = _q_mm_call(x.reshape(-1, k), ln, None, wq, ws_f, bf, res2, eps=eps)
    return out.reshape(*lead, n)


_q_mm.defvjp(lambda *a: (_q_mm(*a), None), _q_raise_bwd)


@jax.custom_vjp
def _q_mm_noln(x, act_scale, wq, ws, b, res):
    """quantize -> int8 dot -> dequant (+res), no LN prologue."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = wq.shape[1]
    s_x = act_scale.astype(jnp.float32) / 127.0
    sinv = (1.0 / s_x).reshape(1, 1).astype(jnp.float32)
    ws_f = s_x * ws.astype(jnp.float32).reshape(1, n)
    bf = (b if b is not None else jnp.zeros((n,), jnp.float32)).astype(jnp.float32)
    res2 = None if res is None else res.reshape(-1, n)
    out = _q_mm_call(x.reshape(-1, k), None, sinv, wq, ws_f, bf, res2, eps=1e-5)
    return out.reshape(*lead, n)


_q_mm_noln.defvjp(lambda *a: (_q_mm_noln(*a), None), _q_raise_bwd)


def ln_matmul_w8a8(ln_params, x, wq, w_scale, act_scale, b=None, *,
                   eps: float = 1e-5, residual=None, impl: str = "auto"):
    """LayerNorm -> static-W8A8 matmul (+bias) (+residual), fused on TPU."""
    m = 1
    for d in x.shape[:-1]:
        m *= d
    gamma, beta = ln_params["scale"], ln_params["bias"]
    if _want_kernel(impl) and q_supported(
            m, x.shape[-1], wq.shape[1], x.dtype.itemsize):
        return _q_mm(x, gamma, beta, act_scale, wq,
                     w_scale.reshape(-1), b, eps, residual)
    return _q_mm_xla(x, gamma, beta, act_scale, wq, w_scale.reshape(-1),
                     b, residual, eps)


def matmul_w8a8(x, wq, w_scale, act_scale, b=None, *, residual=None,
                impl: str = "auto"):
    """Static-W8A8 matmul (+bias) (+residual), quantize fused in."""
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if _want_kernel(impl) and q_supported(
            m, x.shape[-1], wq.shape[1], x.dtype.itemsize):
        return _q_mm_noln(x, act_scale, wq, w_scale.reshape(-1), b, residual)
    return _q_mm_xla(x, None, None, act_scale, wq, w_scale.reshape(-1),
                     b, residual, 1e-5)


def _want_kernel(impl: str) -> bool:
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return impl in ("pallas", "flash") or (impl == "auto" and on_tpu)


def gn_matmul(gn_params, x, w, b=None, *, num_groups: int = 32,
              eps: float = 1e-5, impl: str = "auto"):
    """GroupNorm(x) @ w + b over NHWC x (the 1x1-conv-as-matmul case), with
    the normalize pass fused into the dot on TPU."""
    bsz = x.shape[0]
    k = x.shape[-1]
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    if (_want_kernel(impl) and k % num_groups == 0
            and gn_supported(bsz * s, s, k, w.shape[1], x.dtype.itemsize)
            and (impl != "auto" or _site_wins("gn", bsz * s, k, w.shape[1]))):
        if b is None:
            b = jnp.zeros((w.shape[1],), jnp.float32)
        return _gn_mm(gn_params["scale"], gn_params["bias"], x, w, b,
                      num_groups, eps)
    # fallback keeps the Pallas streaming-GN stats kernel (group_norm_silu)
    # on TPU instead of regressing to the full-f32 XLA group_norm reduction
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu

    xn = group_norm_silu(gn_params, x, num_groups=num_groups, eps=eps,
                         silu=False, impl=impl)
    y = jnp.dot(xn, w.astype(xn.dtype), preferred_element_type=xn.dtype)
    if b is not None:
        y = y + b.astype(xn.dtype)
    return y


def ln_matmul(ln_params, x, w, b=None, *, eps: float = 1e-5,
              impl: str = "auto"):
    """LayerNorm(x) @ w + b, fused on TPU for covered shapes.

    x: (..., K); w: (K, N) (cast to x.dtype inside); b: (N,) or None.
    """
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if (_want_kernel(impl) and supported(
            m, x.shape[-1], w.shape[1], x.dtype.itemsize)
            and (impl != "auto"
                 or _site_wins("ln", m, x.shape[-1], w.shape[1]))):
        if b is None:
            b = jnp.zeros((w.shape[1],), jnp.float32)
        return _ln_mm(x, ln_params["scale"], ln_params["bias"], w, b, eps)
    return _mm_xla(x, ln_params["scale"], ln_params["bias"], w, b, None, eps)


def matmul_residual(x, w, b, res, *, impl: str = "auto"):
    """x @ w + b + res, fused on TPU for covered shapes.  b: (N,) or None."""
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if (_want_kernel(impl) and supported(
            m, x.shape[-1], w.shape[1], x.dtype.itemsize)
            and (impl != "auto"
                 or _site_wins("res", m, x.shape[-1], w.shape[1]))):
        if b is None:
            b = jnp.zeros((w.shape[1],), jnp.float32)
        return _mm_res(x, w, b, res)
    return _mm_xla(x, None, None, w, b, res, 1e-5)
