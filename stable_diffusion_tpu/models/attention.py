"""Functional multi-head (self/cross) attention.

Semantics mirror the reference ``MultiheadSelfAttention``
(models/unet/attention.py:12-100, models/clip/attention.py, and the VAE's
inline AttentionBlock at models/vae/vae.py:42-132): q from x, k/v from
``cond`` when given (cross-attention), optional causal mask, output
projection.  The reference's SDPA-vs-flash_attn runtime toggle collapses into
the ``impl`` argument of :func:`stable_diffusion_tpu.ops.sdpa`.

Parameter tree: {"q_proj", "k_proj", "v_proj", "out_proj"} — linear params.
(The VAE variant names them {"query", "key", "value", "proj_attn"}; see
``vae.py``.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.ops.attention import sdpa


def multihead_attention(
    params,
    x: jax.Array,
    *,
    num_heads: int,
    cond: Optional[jax.Array] = None,
    causal: bool = False,
    impl: str = "auto",
    names=("q_proj", "k_proj", "v_proj", "out_proj"),
    ln_params=None,
    residual: Optional[jax.Array] = None,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """x: (B, Sq, E); cond: (B, Sk, Ck) or None.  Returns (B, Sq, E).

    ``ln_params``/``residual``, when given, fold the caller's pre-LN and
    post-attention residual add into the projection matmuls (one fused
    LN->QKV kernel and one matmul+residual kernel on TPU, ops/linear.py)
    instead of separate XLA elementwise passes.
    """
    qn, kn, vn, on = names
    # Mixed-precision policy: attention computes in x's dtype.  The training
    # loss feeds an f32 text embedding (training.py dreambooth_loss) — without
    # this cast the f32 cross-attn output upcasts every downstream block, and
    # f32 q/k/v double the flash kernels' VMEM footprint (compile OOM).
    kv_in = x if cond is None else cond.astype(x.dtype)
    b, sq, e = x.shape
    d = e // num_heads

    on_tpu = jax.default_backend() in ("tpu", "axon")
    want_kernel = impl in ("flash", "pallas") or (impl == "auto" and on_tpu)
    premerged_ok = "kernel" in params[qn] or (
        "kernel_q" in params[qn] and "act_scale" in params[qn]
    )
    if (want_kernel and not causal and premerged_ok
            and not getattr(layers, "FORCE_UNFUSED_QKV", False)):
        from stable_diffusion_tpu.ops import flash_attention as fa

        sk = kv_in.shape[1]
        if cond is None and fa.premerged_self_supported(
                b, sq, num_heads, d, x.dtype.itemsize):
            return _premerged_attention(
                params, x, x, num_heads, d, names, cross=False,
                ln=ln_params, residual=residual, ln_eps=ln_eps)
        if (cond is not None and sk != sq
                and fa.premerged_cross_supported(b, sq, sk, num_heads, d)):
            return _premerged_attention(
                params, x, kv_in, num_heads, d, names, cross=True,
                ln=ln_params, residual=residual, ln_eps=ln_eps)

    if ln_params is not None:
        x = layers.layer_norm(ln_params, x, eps=ln_eps)
        if cond is None:
            kv_in = x

    if (cond is None and "kernel" in params[qn]
            and not getattr(layers, "FORCE_UNFUSED_QKV", False)):
        # fused QKV: one (E, 3E) matmul instead of three — wider N keeps the
        # MXU busier and reads the activation once
        wq, wk, wv = (params[n]["kernel"].astype(x.dtype) for n in (qn, kn, vn))
        qkv = jnp.dot(x, jnp.concatenate([wq, wk, wv], axis=1), preferred_element_type=x.dtype)
        if "bias" in params[qn]:
            qkv = qkv + jnp.concatenate(
                [params[n]["bias"].astype(x.dtype) for n in (qn, kn, vn)]
            )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, sq, num_heads, d)
        k = k.reshape(b, sq, num_heads, d)
        v = v.reshape(b, sq, num_heads, d)
    elif (cond is None and "kernel_q" in params[qn] and "act_scale" in params[qn]
            and not getattr(layers, "FORCE_UNFUSED_QKV", False)):
        # fused static-W8A8 QKV: q/k/v consume the same x, so they share one
        # act_scale; the int8 kernels and per-channel scales concatenate
        s_x = params[qn]["act_scale"].astype(jnp.float32) / 127.0
        x_q = jnp.round(
            jnp.clip(x.astype(jnp.float32) / s_x, -127.0, 127.0)
        ).astype(jnp.int8)
        w_q = jnp.concatenate([params[n]["kernel_q"] for n in (qn, kn, vn)], axis=1)
        w_s = jnp.concatenate([params[n]["kernel_scale"] for n in (qn, kn, vn)], axis=1)
        acc = jax.lax.dot_general(
            x_q, w_q, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        qkv = (acc.astype(jnp.float32) * (s_x * w_s)).astype(x.dtype)
        if "bias" in params[qn]:
            qkv = qkv + jnp.concatenate(
                [params[n]["bias"].astype(x.dtype) for n in (qn, kn, vn)]
            )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, sq, num_heads, d)
        k = k.reshape(b, sq, num_heads, d)
        v = v.reshape(b, sq, num_heads, d)
    else:
        q = layers.linear(params[qn], x).reshape(b, sq, num_heads, d)
        k = layers.linear(params[kn], kv_in).reshape(b, kv_in.shape[1], num_heads, d)
        v = layers.linear(params[vn], kv_in).reshape(b, kv_in.shape[1], num_heads, d)

    out = sdpa(q, k, v, causal=causal, impl=impl)
    out = out.reshape(b, sq, e)
    out = layers.linear(params[on], out)
    return out if residual is None else out + residual


def _premerged_attention(params, x, kv_in, num_heads, d, names, *, cross,
                         ln=None, residual=None, ln_eps=1e-5):
    """Kernel-layout attention with the per-head zero-padding folded into the
    projection WEIGHTS (built in-trace, hoisted out of the denoise scan by
    XLA's loop-invariant code motion) — the per-step pad/reshape copies of
    q/k/v/out around the Pallas kernels disappear entirely.

    Padded q/k lanes are zero on both sides so logits are exact; padded v
    lanes produce zero outputs, which meet zero rows in the padded out_proj.

    ``ln``/``residual`` fold the caller's pre-LN into the QKV projection and
    the residual add into the output projection (ops/linear.py fused matmuls)
    — bf16 via ln_matmul/matmul_residual, static-W8A8 via the int8 variants
    (quantize fused into the prologue; calibration recorded act ranges on the
    post-LN input, so the semantics match the explicit-LN path).
    """
    from stable_diffusion_tpu.ops import flash_attention as fa
    from stable_diffusion_tpu.ops import linear as fl

    qn, kn, vn, on = names
    b, sq, e = x.shape
    dp = fa._padded_dim(d)
    wp = fa.premerged_width(num_heads, d)
    hd = num_heads * dp
    dt = x.dtype

    def pad_cols(p):
        # (in, E) -> (in, wp): per-head d -> dp column padding + tail pad
        w = p["kernel"].astype(dt)
        w = w.reshape(w.shape[0], num_heads, d)
        if dp != d:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, dp - d)))
        w = w.reshape(-1, hd)
        if wp != hd:
            w = jnp.pad(w, ((0, 0), (0, wp - hd)))
        return w

    def pad_bias(p):
        bb = p["bias"].astype(dt).reshape(num_heads, d)
        if dp != d:
            bb = jnp.pad(bb, ((0, 0), (0, dp - d)))
        bb = bb.reshape(hd)
        if wp != hd:
            bb = jnp.pad(bb, (0, wp - hd))
        return bb

    def pad_cols_q(p):
        # int8 kernel + (1, E) per-channel scale row, both head-padded
        wq_ = p["kernel_q"].reshape(p["kernel_q"].shape[0], num_heads, d)
        sc = p["kernel_scale"].reshape(1, num_heads, d)
        if dp != d:
            wq_ = jnp.pad(wq_, ((0, 0), (0, 0), (0, dp - d)))
            sc = jnp.pad(sc, ((0, 0), (0, 0), (0, dp - d)))
        wq_ = wq_.reshape(-1, hd)
        sc = sc.reshape(1, hd)
        if wp != hd:
            wq_ = jnp.pad(wq_, ((0, 0), (0, wp - hd)))
            sc = jnp.pad(sc, ((0, 0), (0, wp - hd)))
        return wq_, sc

    def proj(p, inp):
        """inp @ W in the padded layout — bf16 dot or W8A8 int8 dot."""
        if "kernel" in p:
            y = jnp.dot(inp, pad_cols(p), preferred_element_type=dt)
        else:
            s_x = p["act_scale"].astype(jnp.float32) / 127.0
            iq = jnp.round(
                jnp.clip(inp.astype(jnp.float32) / s_x, -127.0, 127.0)
            ).astype(jnp.int8)
            w_q, w_s = pad_cols_q(p)
            acc = jax.lax.dot_general(
                iq, w_q, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = (acc.astype(jnp.float32) * (s_x * w_s)).astype(dt)
        return y + pad_bias(p) if "bias" in p else y

    if cross:
        pq = params[qn]
        bq_ = pad_bias(pq) if "bias" in pq else None
        if ln is not None and "kernel" in pq:
            q3 = fl.ln_matmul(ln, x, pad_cols(pq), bq_, eps=ln_eps)
        elif ln is not None:
            w_q, w_s = pad_cols_q(pq)
            q3 = fl.ln_matmul_w8a8(
                ln, x, w_q, w_s, pq["act_scale"], bq_, eps=ln_eps,
            )
        else:
            q3 = proj(pq, x)
        k3 = proj(params[kn], kv_in)
        v3 = proj(params[vn], kv_in)
        o = fa.flash_cross_premerged(
            q3, k3, v3, scale=d ** -0.5, num_heads=num_heads, head_dim=dp,
            kv_len=kv_in.shape[1],
        )
    else:
        if all("kernel" in params[n] for n in (qn, kn, vn)):
            wqkv = jnp.concatenate(
                [pad_cols(params[n]) for n in (qn, kn, vn)], axis=1
            )
            bqkv = (jnp.concatenate([pad_bias(params[n]) for n in (qn, kn, vn)])
                    if "bias" in params[qn] else None)
            if ln is not None:
                qkv = fl.ln_matmul(ln, x, wqkv, bqkv, eps=ln_eps)
            else:
                qkv = jnp.dot(x, wqkv, preferred_element_type=dt)
                if bqkv is not None:
                    qkv = qkv + bqkv
        else:
            # fused W8A8 QKV in the padded layout (shared act_scale; q/k/v
            # consume the same LN(x), so calibration recorded one range)
            cols = [pad_cols_q(params[n]) for n in (qn, kn, vn)]
            w_q = jnp.concatenate([c[0] for c in cols], axis=1)
            w_s = jnp.concatenate([c[1] for c in cols], axis=1)
            bqkv = (jnp.concatenate([pad_bias(params[n]) for n in (qn, kn, vn)])
                    if "bias" in params[qn] else None)
            if ln is not None:
                qkv = fl.ln_matmul_w8a8(
                    ln, x, w_q, w_s, params[qn]["act_scale"], bqkv, eps=ln_eps,
                )
            else:
                qkv = fl.matmul_w8a8(x, w_q, w_s, params[qn]["act_scale"], bqkv)
        q3, k3, v3 = jnp.split(qkv, 3, axis=-1)
        o = fa.flash_self_premerged(
            q3, k3, v3, scale=d ** -0.5, num_heads=num_heads, head_dim=dp
        )

    def pad_rows(w):
        # (E, E) -> (wp, E): per-head input-row padding for the out proj
        w = w.reshape(num_heads, d, e)
        if dp != d:
            w = jnp.pad(w, ((0, 0), (0, dp - d), (0, 0)))
        w = w.reshape(hd, e)
        if wp != hd:
            w = jnp.pad(w, ((0, wp - hd), (0, 0)))
        return w

    po = params[on]
    if "kernel" in po:
        w_o = pad_rows(po["kernel"].astype(dt))
        b_o = po["bias"] if "bias" in po else None
        if residual is not None:
            return fl.matmul_residual(o, w_o, b_o, residual)
        y = jnp.dot(o, w_o, preferred_element_type=dt)
        if b_o is not None:
            y = y + b_o.astype(dt)
        return y
    return fl.matmul_w8a8(
        o, pad_rows(po["kernel_q"]), po["kernel_scale"].reshape(1, e),
        po["act_scale"], po.get("bias"), residual=residual,
    )


def init_multihead_attention(
    key,
    embed_dim: int,
    *,
    cond_dim: Optional[int] = None,
    qkv_bias: bool = True,
    out_bias: bool = True,
    names=("q_proj", "k_proj", "v_proj", "out_proj"),
    dtype=jnp.float32,
):
    cond_dim = embed_dim if cond_dim is None else cond_dim
    qn, kn, vn, on = names
    ks = jax.random.split(key, 4)
    return {
        qn: layers.init_linear(ks[0], embed_dim, embed_dim, bias=qkv_bias, dtype=dtype),
        kn: layers.init_linear(ks[1], cond_dim, embed_dim, bias=qkv_bias, dtype=dtype),
        vn: layers.init_linear(ks[2], cond_dim, embed_dim, bias=qkv_bias, dtype=dtype),
        on: layers.init_linear(ks[3], embed_dim, embed_dim, bias=out_bias, dtype=dtype),
    }
