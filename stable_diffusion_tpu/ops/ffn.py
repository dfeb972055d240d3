"""Fused (LayerNorm ->) GeGLU FFN (-> +residual) Pallas kernel.

The reference computes the transformer-block MLP as LN, proj-to-8C, chunk,
x1 * gelu(gate), 4C->C linear, residual add (models/activation_fn.py:12-20,
models/unet/unet.py:127-150).  As XLA ops that materializes an (M, 8C)
intermediate in HBM plus separate LN-stats / normalize / residual passes.
This kernel pipelines the whole sub-block through VMEM:

    x_m' = LN(x_m)                        # f32 stats in-kernel (optional)
    for each hidden block n:
        hv = x_m' @ W1[:, n_value]
        hg = x_m' @ W1[:, n_gate]
        h  = (hv + bv) * gelu(hg + bg)    # exact-erf GELU, f32 VPU
        acc_m += h @ W2[n]
    out_m = acc_m + b2 (+ res_m)          # residual add fused (optional)

Two block layouts, chosen by VMEM feasibility:
  * "mo" (m-outer): full W1/W2 resident, m blocks stream — the C<=640
    stages, where all weights fit.
  * "no" (n-outer): the f32 accumulator for ALL m blocks persists in
    scratch while weight blocks stream exactly ONCE per n — the C=1280
    stages whose 39 MB weight slab would otherwise re-stream per m block
    (the reason the v1 kernel lost to XLA there).

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


def _ln_f32(x, gamma, beta, eps):
    """Row LayerNorm matching models/layers.layer_norm (f32 stats)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


def _make_kernel(layout: str, has_ln: bool, has_res: bool, eps: float):
    def kernel(*refs):
        if layout == "mo":
            mi, n = pl.program_id(0), pl.program_id(1)
            nn = pl.num_programs(1)
        else:
            n, mi = pl.program_id(0), pl.program_id(1)
            nn = pl.num_programs(0)
        i = 0
        x_ref = refs[i]; i += 1
        if has_ln:
            g_ref, be_ref = refs[i], refs[i + 1]; i += 2
        w1v, w1g, b1v, b1g, w2, b2 = refs[i:i + 6]; i += 6
        res_ref = None
        if has_res:
            res_ref = refs[i]; i += 1
        o_ref = refs[i]; acc_ref = refs[i + 1]

        x = x_ref[...]
        if has_ln:
            x = _ln_f32(x, g_ref[...].astype(jnp.float32),
                        be_ref[...].astype(jnp.float32), eps)
        hv = jnp.dot(x, w1v[...], preferred_element_type=jnp.float32)
        hg = jnp.dot(x, w1g[...], preferred_element_type=jnp.float32)
        h = (hv + b1v[...]) * _gelu_f32(hg + b1g[...])
        part = jnp.dot(h.astype(x.dtype), w2[...],
                       preferred_element_type=jnp.float32)

        acc = acc_ref.at[mi] if layout == "no" else acc_ref

        @pl.when(n == 0)
        def _first():
            acc[...] = part

        @pl.when(n > 0)
        def _rest():
            acc[...] = acc[...] + part

        @pl.when(n == nn - 1)
        def _store():
            out = acc[...] + b2[...]
            if has_res:
                out = out + res_ref[...].astype(jnp.float32)
            o_ref[...] = out.astype(o_ref.dtype)

    return kernel


def _plan(m: int, c: int, hidden: int, itemsize: int):
    """(layout, bm, bn) under the VMEM budget; (None, 0, 0) if infeasible."""
    budget = 13 * 1024 * 1024

    def io_bytes(bm):
        # x, out, res blocks (2-buffered) + f32 acc row block
        return 3 * 2 * bm * c * itemsize

    # m-outer with ALL weights resident (single n block): no restreaming
    wt_full = 2 * 3 * c * hidden * itemsize
    for bm in (512, 256, 128):
        if m % bm or bm > m:
            continue
        tmp = 3 * bm * hidden * 4
        if wt_full + io_bytes(bm) + bm * c * 4 + tmp <= budget:
            return "mo", bm, hidden
    # n-outer with the full-M f32 accumulator persistent in scratch and
    # weight blocks streamed exactly once per n
    accf = m * c * 4
    for bn in (1280, 1024, 640, 512, 256):
        if bn > hidden or hidden % bn:
            continue
        for bm in (256, 128):
            if m % bm or bm > m:
                continue
            wt = 2 * 3 * c * bn * itemsize
            tmp = 3 * bm * bn * 4
            if accf + wt + io_bytes(bm) + tmp <= budget:
                return "no", bm, bn
    # m-outer multi-n fallback (weights restream per m block — slowest)
    for bn in (1280, 1024, 640, 512, 256, 128):
        if bn > hidden or hidden % bn:
            continue
        for bm in (512, 256, 128):
            if m % bm or bm > m:
                continue
            wt = 2 * 3 * c * bn * itemsize
            tmp = 3 * bm * bn * 4
            if wt + io_bytes(bm) + bm * c * 4 + tmp <= budget:
                return "mo", bm, bn
    return None, 0, 0


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
    m = b * s
    if m % 128:
        return False
    layout, bm, bn = _plan(m, c, hidden, x.dtype.itemsize)
    return layout is not None


def _ffn_call(x2, ln, w1v, w1g, b1v, b1g, w2, b2, res2, *,
              layout, bm, bn, eps):
    m, c = x2.shape
    hidden = w2.shape[0]
    n_blocks = hidden // bn
    m_blocks = m // bm
    has_ln = ln is not None
    has_res = res2 is not None

    if layout == "mo":
        grid = (m_blocks, n_blocks)
        midx = lambda i, n: (i, 0)
        w_c = lambda i, n: (0, n)
        w_r = lambda i, n: (n, 0)
        const = lambda i, n: (0, 0)
        semantics = ("parallel", "arbitrary")
        acc_shape = pltpu.VMEM((bm, c), jnp.float32)
    else:
        grid = (n_blocks, m_blocks)
        midx = lambda n, i: (i, 0)
        w_c = lambda n, i: (0, n)
        w_r = lambda n, i: (n, 0)
        const = lambda n, i: (0, 0)
        semantics = ("arbitrary", "arbitrary")
        acc_shape = pltpu.VMEM((m_blocks, bm, c), jnp.float32)

    inputs = [x2]
    specs = [pl.BlockSpec((bm, c), midx)]
    if has_ln:
        inputs += [ln[0].reshape(1, c), ln[1].reshape(1, c)]
        specs += [pl.BlockSpec((1, c), const), pl.BlockSpec((1, c), const)]
    inputs += [w1v, w1g, b1v, b1g, w2, b2]
    specs += [
        pl.BlockSpec((c, bn), w_c),
        pl.BlockSpec((c, bn), w_c),
        pl.BlockSpec((1, bn), w_c),
        pl.BlockSpec((1, bn), w_c),
        pl.BlockSpec((bn, c), w_r),
        pl.BlockSpec((1, c), const),
    ]
    if has_res:
        inputs.append(res2)
        specs.append(pl.BlockSpec((bm, c), midx))

    kernel = _make_kernel(layout, has_ln, has_res, eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, c), midx),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        scratch_shapes=[acc_shape],
        compiler_params=pltpu.CompilerParams(dimension_semantics=semantics),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * 3 * hidden,
            bytes_accessed=(2 * m * c + 3 * c * hidden) * x2.dtype.itemsize,
            transcendentals=m * hidden,
        ),
    )(*inputs)


def _ffn_xla(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=x.dtype) + b1.astype(x.dtype)
    x1, gate = jnp.split(h, 2, axis=-1)
    h = x1 * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return jnp.dot(h, w2.astype(x.dtype), preferred_element_type=x.dtype) + b2.astype(x.dtype)


def _ffn_impl(x, gamma, beta, w1, b1, w2, b2, res, eps):
    b, s, c = x.shape
    hidden = w2.shape[0]
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    w1v, w1g = w1[:, :hidden], w1[:, hidden:]
    b1f = b1.astype(jnp.float32)
    b1v, b1g = b1f[:hidden].reshape(1, hidden), b1f[hidden:].reshape(1, hidden)
    b2f = b2.astype(jnp.float32).reshape(1, c)
    x2 = x.reshape(b * s, c)
    ln = None if gamma is None else (gamma.astype(jnp.float32), beta.astype(jnp.float32))
    res2 = None if res is None else res.reshape(b * s, c)
    layout, bm, bn = _plan(b * s, c, hidden, x.dtype.itemsize)
    out = _ffn_call(x2, ln, w1v, w1g, b1v, b1g, w2, b2f, res2,
                    layout=layout, bm=bm, bn=bn, eps=eps)
    return out.reshape(b, s, c)


@jax.custom_vjp
def _ffn(x, w1, b1, w2, b2):
    return _ffn_impl(x, None, None, w1, b1, w2, b2, None, 1e-5)


def _ffn_fwd(x, w1, b1, w2, b2):
    return _ffn(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ffn_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_ffn_xla, x, w1, b1, w2, b2)
    return vjp(g)


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def _ln_ffn_res_xla(x, gamma, beta, w1, b1, w2, b2, res, eps):
    from stable_diffusion_tpu.models import layers

    h = layers.layer_norm({"scale": gamma, "bias": beta}, x, eps=eps)
    return _ffn_xla(h, w1, b1, w2, b2) + res


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _ln_ffn_res(x, gamma, beta, w1, b1, w2, b2, res, eps):
    return _ffn_impl(x, gamma, beta, w1, b1, w2, b2, res, eps)


def _ln_ffn_res_fwd(x, gamma, beta, w1, b1, w2, b2, res, eps):
    out = _ln_ffn_res(x, gamma, beta, w1, b1, w2, b2, res, eps)
    return out, (x, gamma, beta, w1, b1, w2, b2, res)


def _ln_ffn_res_bwd(eps, saved, g):
    x, gamma, beta, w1, b1, w2, b2, res = saved
    _, vjp = jax.vjp(
        lambda *a: _ln_ffn_res_xla(*a, eps), x, gamma, beta, w1, b1, w2, b2, res
    )
    return vjp(g)


_ln_ffn_res.defvjp(_ln_ffn_res_fwd, _ln_ffn_res_bwd)


# ---------------------------------------------------------------------------
# Static-W8A8 GeGLU FFN: LN -> quantize -> int8 W1v/W1g dots -> dequant ->
# GeGLU (f32 VPU) -> requantize -> int8 W2 dot -> int32 accumulate ->
# dequant (+bias) (+residual).  Neither int8 activation nor the (M, 4C)
# intermediate ever exists in HBM.  m-outer grid; int8 weight blocks stream
# (half the bytes of the bf16 kernel's).  Inference-only (VJP raises).
# ---------------------------------------------------------------------------


def _make_q_kernel(has_ln: bool, has_res: bool, eps: float):
    def kernel(*refs):
        mi, n = pl.program_id(0), pl.program_id(1)
        nn = pl.num_programs(1)
        i = 0
        x_ref = refs[i]; i += 1
        if has_ln:
            g_ref, be_ref = refs[i], refs[i + 1]; i += 2
        else:
            s0inv_ref = refs[i]; i += 1
        (w1vq, w1gq, ws1v, ws1g, b1v, b1g,
         sh_ref, w2q, ws2, b2) = refs[i:i + 10]; i += 10
        res_ref = None
        if has_res:
            res_ref = refs[i]; i += 1
        o_ref = refs[i]; acc_ref = refs[i + 1]

        if has_ln:
            # gamma/beta pre-divided by the act scale: LN output IS the
            # quantizer input
            xs = _ln_f32(x_ref[...].astype(jnp.float32),
                         g_ref[...], be_ref[...], eps)
        else:
            xs = x_ref[...].astype(jnp.float32) * s0inv_ref[0, 0]
        xq = jnp.round(jnp.clip(xs, -127.0, 127.0)).astype(jnp.int8)
        hv = jnp.dot(xq, w1vq[...], preferred_element_type=jnp.int32)
        hg = jnp.dot(xq, w1gq[...], preferred_element_type=jnp.int32)
        hvf = hv.astype(jnp.float32) * ws1v[...] + b1v[...]
        hgf = hg.astype(jnp.float32) * ws1g[...] + b1g[...]
        h = hvf * _gelu_f32(hgf)
        # requantize with the second linear's calibrated act scale
        # (sh_ref holds 1/s_h so the kernel multiplies, not divides)
        hq = jnp.round(
            jnp.clip(h * sh_ref[0, 0], -127.0, 127.0)
        ).astype(jnp.int8)
        part = jnp.dot(hq, w2q[...], preferred_element_type=jnp.int32)

        @pl.when(n == 0)
        def _first():
            acc_ref[...] = part

        @pl.when(n > 0)
        def _rest():
            acc_ref[...] = acc_ref[...] + part

        @pl.when(n == nn - 1)
        def _store():
            out = acc_ref[...].astype(jnp.float32) * ws2[...] + b2[...]
            if has_res:
                out = out + res_ref[...].astype(jnp.float32)
            o_ref[...] = out.astype(o_ref.dtype)

    return kernel


def _q_plan(m: int, c: int, hidden: int, itemsize: int):
    """(bm, bn) for the int8 kernel (m-outer, int8 weights stream per n)."""
    budget = 13 * 1024 * 1024
    for bn in (hidden, 2560, 1280, 1024, 640, 512, 256):
        if bn > hidden or hidden % bn:
            continue
        for bm in (512, 256, 128):
            if bm > m or m % bm:
                continue
            wt = 2 * (2 * c * bn + bn * c)  # int8, double-buffered
            io = 3 * 2 * bm * c * itemsize
            acc = bm * c * 4
            tmp = bm * c * 4 + bm * c + 3 * bm * bn * 4 + bm * bn
            if wt + io + acc + tmp <= budget:
                return bm, bn
    return 0, 0


def q_supported(x: jax.Array, hidden: int) -> bool:
    from stable_diffusion_tpu.ops.linear import q_fused_enabled

    if not q_fused_enabled():
        return False
    if x.ndim != 3:
        return False
    b, s, c = x.shape
    m = b * s
    if m % 128 or c % 32 or hidden % 128:
        return False
    return _q_plan(m, c, hidden, x.dtype.itemsize) != (0, 0)


def _q_raise_bwd(*a, **k):
    from stable_diffusion_tpu.ops.linear import _q_raise_bwd as impl

    return impl(*a, **k)


def _ffn_q_xla(x, gamma, beta, p0, p1, res, eps):
    """XLA reference: LN -> int8 linear -> GeGLU -> int8 linear (+res)."""
    from stable_diffusion_tpu.models import layers

    h = x
    if gamma is not None:
        h = layers.layer_norm({"scale": gamma, "bias": beta}, x, eps=eps)
    hh = layers.linear(p0, h)
    x1, gate = jnp.split(hh, 2, axis=-1)
    hh = x1 * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    y = layers.linear(p1, hh)
    return y if res is None else y + res


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _ffn_q(x, gamma, beta, w1q, ws1, b1, s0, w2q, ws2_b2_sh, res, eps):
    ws2, b2, s_h = ws2_b2_sh
    b, s, c = x.shape
    hidden = w2q.shape[0]
    m = b * s
    bm, bn = _q_plan(m, c, hidden, x.dtype.itemsize)

    s0f = s0.astype(jnp.float32) / 127.0
    shf = s_h.astype(jnp.float32) / 127.0
    ws1f = ws1.astype(jnp.float32).reshape(1, 2 * hidden) * s0f
    ws1v_, ws1g_ = ws1f[:, :hidden], ws1f[:, hidden:]
    b1f = b1.astype(jnp.float32).reshape(1, 2 * hidden)
    b1v_, b1g_ = b1f[:, :hidden], b1f[:, hidden:]
    ws2f = ws2.astype(jnp.float32).reshape(1, c) * shf
    b2f = b2.astype(jnp.float32).reshape(1, c)
    w1vq_, w1gq_ = w1q[:, :hidden], w1q[:, hidden:]

    has_ln = gamma is not None
    has_res = res is not None
    x2 = x.reshape(m, c)
    grid = (m // bm, hidden // bn)
    midx = lambda i, n: (i, 0)
    w_c = lambda i, n: (0, n)
    w_r = lambda i, n: (n, 0)
    const = lambda i, n: (0, 0)

    inputs = [x2]
    specs = [pl.BlockSpec((bm, c), midx)]
    if has_ln:
        inputs += [
            (gamma.astype(jnp.float32) / s0f).reshape(1, c),
            (beta.astype(jnp.float32) / s0f).reshape(1, c),
        ]
        specs += [pl.BlockSpec((1, c), const)] * 2
    else:
        inputs.append((1.0 / s0f).reshape(1, 1))
        specs.append(pl.BlockSpec((1, 1), const))
    inputs += [w1vq_, w1gq_, ws1v_, ws1g_, b1v_, b1g_,
               (1.0 / shf).reshape(1, 1), w2q, ws2f, b2f]
    specs += [
        pl.BlockSpec((c, bn), w_c),
        pl.BlockSpec((c, bn), w_c),
        pl.BlockSpec((1, bn), w_c),
        pl.BlockSpec((1, bn), w_c),
        pl.BlockSpec((1, bn), w_c),
        pl.BlockSpec((1, bn), w_c),
        pl.BlockSpec((1, 1), const),
        pl.BlockSpec((bn, c), w_r),
        pl.BlockSpec((1, c), const),
        pl.BlockSpec((1, c), const),
    ]
    if has_res:
        inputs.append(res.reshape(m, c))
        specs.append(pl.BlockSpec((bm, c), midx))

    out = pl.pallas_call(
        _make_q_kernel(has_ln, has_res, eps),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, c), midx),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c * 3 * hidden,
            bytes_accessed=2 * m * c * x.dtype.itemsize + 3 * c * hidden,
            transcendentals=m * hidden,
        ),
    )(*inputs)
    return out.reshape(b, s, c)


_ffn_q.defvjp(lambda *a: (_ffn_q(*a), None), _q_raise_bwd)


def geglu_ffn(ffn_params, x: jax.Array, *, ln_params=None, residual=None,
              eps: float = 1e-5, impl: str = "auto") -> jax.Array:
    """The attention block's FFN: (LN ->) GeGLU proj + output linear
    (-> +residual), fused into one Pallas kernel on TPU for covered shapes.

    ``ffn_params``: {"0": {"proj": linear}, "1": linear} (reference
    unet.py:127-150 naming).  ``ln_params``/``residual``, when given, fold
    the pre-LN and the residual add into the kernel.  The quantized (int8)
    and uncovered forms fall back to the layer path.
    """
    from stable_diffusion_tpu.models import layers

    p0, p1 = ffn_params["0"]["proj"], ffn_params["1"]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    want = impl in ("pallas", "flash") or (impl == "auto" and on_tpu)
    if (want and "kernel_q" in p0 and "act_scale" in p0
            and "kernel_q" in p1 and "act_scale" in p1
            and "bias" in p0 and "bias" in p1
            and q_supported(x, p1["kernel_q"].shape[0])):
        gamma = ln_params["scale"] if ln_params is not None else None
        beta = ln_params["bias"] if ln_params is not None else None
        out = _ffn_q(
            x, gamma, beta, p0["kernel_q"], p0["kernel_scale"], p0["bias"],
            p0["act_scale"], p1["kernel_q"],
            (p1["kernel_scale"], p1["bias"], p1["act_scale"]),
            residual, eps,
        )
        return out
    if (want and "kernel" in p0 and "kernel" in p1
            and "bias" in p0 and "bias" in p1
            and supported(x, p0["kernel"])):
        if ln_params is not None:
            r = residual if residual is not None else jnp.zeros_like(x)
            return _ln_ffn_res(
                x, ln_params["scale"], ln_params["bias"],
                p0["kernel"], p0["bias"], p1["kernel"], p1["bias"], r, eps,
            )
        out = _ffn(x, p0["kernel"], p0["bias"], p1["kernel"], p1["bias"])
        return out if residual is None else out + residual
    h = x if ln_params is None else layers.layer_norm(ln_params, x, eps=eps)
    h = layers.geglu(ffn_params["0"], h)
    h = layers.linear(p1, h)
    return h if residual is None else h + residual
