"""Pallas TPU flash attention (inference hot path).

TPU-native replacement for the reference's optional ``flash_attn`` CUDA wheel
(reference models/unet/attention.py:52-67).  Online-softmax blockwise
attention with a layout chosen for the TPU memory system:

  * Inputs stay in the (B, S, H, D) projection layout and are viewed as
    (B, S, H*Dp) — a free minor-dim reshape, NO transposes (a BHSD permute
    would cost ~1 GB/step of HBM traffic across the UNet's 32 attentions).
  * The grid walks (batch, q_blocks, kv_blocks) with kv innermost; all heads
    are processed inside one grid step (static python loop), so K/V block
    loads are shared across heads and grid overhead is amortized.
  * Matmul operands stay bf16 (MXU bf16 x bf16 -> f32 full rate); softmax
    statistics are f32 in VMEM scratch persisting across kv steps.
  * Head dims that are not lane-friendly (SD1.5 uses 40/80/160) are
    zero-padded per head to {64, 128, 256} — zero dims contribute nothing.

Covers self-attention (seq in {256..4096}); 77-token cross attention and the
causal text towers route to the XLA path (tiny logits, XLA fuses them well).
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


def _padded_dim(d: int) -> int:
    for t in (64, 128, 256, 512):
        if d <= t:
            return t
    return 0


def _pick_blocks(seq: int, width: int, itemsize: int = 2):
    """width = num_heads * padded_head_dim (the merged lane dim).  Blocks are
    sized for bf16; f32 inputs (itemsize 4 — e.g. an all-f32 training
    config) use the next tier down so the online kernel's double-buffered
    blocks stay inside VMEM."""
    eff = width * itemsize // 2
    if eff <= 512:
        bq, bk = 512, 1024
    elif eff <= 1024:
        bq, bk = 256, 512
    else:
        bq, bk = 256, 256
    if seq > 4096:
        # Long sequences (SD2.1 768^2: s=9216): the default bk leaves the
        # online kernel VPU-bound on per-block rescaling and narrow-N QK
        # dots (measured 66.6 TF/s at s=9216 w=384 vs 77.9 retuned).  Take
        # the largest 128-multiple kv block dividing seq whose double-
        # buffered K+V blocks plus the f32 (bq, bk) logits slab stay under
        # ~12 MB (bk=4608/w384 at 19.2 MiB scoped OOM'd the 16 MiB limit);
        # the <=4096 shapes keep their measured defaults.
        per_bk = 4 * width * itemsize + 4 * bq
        best = bk
        for cand in range(128, seq + 1, 128):
            if seq % cand == 0 and cand * per_bk <= 12_000_000:
                best = max(best, cand)
        bk = best
    bq, bk = min(bq, seq), min(bk, seq)
    # the grid requires seq % block == 0 (e.g. s=2304 with the 512/1024
    # defaults); halve down to the largest dividing block
    while bq > 128 and seq % bq:
        bq //= 2
    while bk > 128 and seq % bk:
        bk //= 2
    return bq, bk


def _single_bq(s: int, w: int, itemsize: int) -> int:
    """The q-block size the single-pass (resident-KV) kernel would use for
    (s, w), or 0 when the shape doesn't fit its VMEM budget.  Measured
    envelope entries (_SINGLE_PASS_BQ) take precedence over the analytic
    fit model."""
    if itemsize == 2:
        hit = _SINGLE_PASS_BQ.get((s, w))
        if hit is not None:
            return hit
    for bq in (256, 128, 64):
        bq = min(bq, s)
        if s % bq == 0 and _fits_single_pass(s, w, itemsize, bq):
            return bq
    return 0


def supported(q: jax.Array, k: jax.Array) -> bool:
    """True when the Pallas kernel covers this shape (non-causal self-attn)."""
    if q.ndim != 4 or k.ndim != 4:
        return False
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq != sk:
        return False  # cross-attn handled by cross_supported / flash_cross
    dp = _padded_dim(d)
    if dp == 0 or sq < 128:
        return False
    w = (h * dp + 127) // 128 * 128
    # covered by either route: single-pass (resident KV) when it fits VMEM —
    # e.g. s=2304 w=640, which the online divisibility test alone would
    # reject (2304 % 512 != 0) — otherwise the online kernel's blocks must
    # divide the sequence
    if _single_bq(sq, w, q.dtype.itemsize):
        return True
    bq, bk = _pick_blocks(sq, w, q.dtype.itemsize)
    return sq % bq == 0 and sk % bk == 0


def cross_supported(q: jax.Array, k: jax.Array) -> bool:
    """Short-KV cross attention (UNet text conditioning: kv=77 tokens).

    The whole (padded-to-128) K/V block sits in VMEM; one fused
    logits-softmax-PV kernel per q block."""
    if q.ndim != 4 or k.ndim != 4:
        return False
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq == sk or sk > 128:
        return False
    dp = _padded_dim(d)
    if dp == 0 or h * dp > 2048:
        return False
    return sq >= 128 and sq % 128 == 0


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, num_heads: int, head_dim: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # bf16 operands -> f32 accumulation: full MXU rate
        q = q_ref[0, :, sl]  # (BQ, Dp)
        k = k_ref[0, :, sl]  # (BK, Dp)
        v = v_ref[0, :, sl]  # (BK, Dp)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK) f32

        m_prev = m_ref[h, :, 0:1]  # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)

        l_new = l_ref[h, :, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_ref[:, sl] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_ref[:, sl] = acc_new
        m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
        l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

        @pl.when(j == nk - 1)
        def _finalize():
            o_ref[0, :, sl] = (acc_new / l_new).astype(o_ref.dtype)


def _flash_merged_online(q, k, v, *, scale: float, num_heads: int, head_dim: int,
                         bq: int | None = None, bk: int | None = None):
    """Online-softmax path (kv-blocked) for sequences whose full K/V exceed
    the VMEM budget.  q, k, v: (B, S, H*Dp) -> (B, S, H*Dp).  bq/bk overrides
    are for microbenching block choices (benchmarks/microbench_attn_long.py)."""
    b, s, w = q.shape
    bq0, bk0 = _pick_blocks(s, w, q.dtype.itemsize)
    bq, bk = bq or bq0, bk or bk0
    grid = (b, s // bq, s // bk)
    kernel = functools.partial(
        _flash_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, bk, w), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, bk, w), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, w), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, w), jnp.float32),
            pltpu.VMEM((num_heads, bq, 128), jnp.float32),
            pltpu.VMEM((num_heads, bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * w,
            bytes_accessed=4 * b * s * w * q.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
    )(q, k, v)


def _single_pass_kernel(q_ref, k_hbm, v_hbm, o_ref, kv_ref, sem, *,
                        scale, num_heads, head_dim):
    """Full K/V resident in VMEM scratch: plain (numerically-safe) softmax
    per q block, no online rescaling.  K/V live in HBM and are DMA'd ONCE per
    batch element into a single persistent scratch buffer -- explicit control
    so Mosaic doesn't double-buffer the large blocks (auto-pipelining them
    blew the 16 MB VMEM limit)."""
    i = pl.program_id(1)
    g = pl.program_id(0)

    @pl.when(i == 0)
    def _load_kv():
        ck = pltpu.make_async_copy(k_hbm.at[g], kv_ref.at[0], sem.at[0])
        cv = pltpu.make_async_copy(v_hbm.at[g], kv_ref.at[1], sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]  # (BQ, Dp) bf16
        k = kv_ref[0, :, sl]  # (S, Dp)
        v = kv_ref[1, :, sl]  # (S, Dp)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, S) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


# single-pass needs K+V (scratch, single-buffered) + f32 logits row in VMEM.
# 15.5M: measured fit with the DMA-scratch design (K/V not double-buffered);
# bq=128 at (s=4096, w=512) runs ~2x faster than bq=64 (M=128 fills the MXU
# sublane tile), so the budget is set to admit it.
_VMEM_BUDGET = int(15.5 * 1024 * 1024)


def _fits_single_pass(s: int, w: int, itemsize: int, bq: int) -> bool:
    kv = 2 * s * w * itemsize
    row = bq * s * (4 + 4 + 2)  # f32 logits + exp'd + bf16 copy
    bufs = 4 * bq * w * (itemsize + 4)  # double-buffered q/out + f32 acc
    return kv + row + bufs < _VMEM_BUDGET


# Measured single-pass envelope (benchmarks/probe_single_pass.py, v5e, bf16):
# the largest q block that actually COMPILES for the given (seq, merged
# width).  Mosaic's per-head temporary liveness is scheduling-dependent, so
# the analytic model above over-admits in a shape-dependent way — e.g.
# s=2304/w=640/bq=256 models 15.0 MiB but compiles at 18.95 MiB scoped
# (VMEM OOM), while s=4096/w=512/bq=128 models 15.2 MiB and fits.  A 0
# entry means no block size compiles or single-pass measured slower than
# the online/XLA routes; unlisted shapes use the analytic model.
_SINGLE_PASS_BQ: dict[tuple[int, int], int] = {
    (2304, 640): 128,  # SD2.1 48^2: 0.390 ms (69.6 TF/s) vs XLA 1.169 / online 1.96
    (576, 1280): 0,    # SD2.1 24^2: XLA wins (0.034 ms, 100.7 TF/s) vs single 0.052
}


def _flash_merged_single(q, k, v, *, scale: float, num_heads: int, head_dim: int, bq: int):
    b, s, w = q.shape
    grid = (b, s // bq)
    kernel = functools.partial(
        _single_pass_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda g, i: (g, i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, bq, w), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, w), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, s, w), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * w,
            bytes_accessed=4 * b * s * w * q.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
    )(q, k, v)


def _flash_merged(q, k, v, *, scale: float, num_heads: int, head_dim: int):
    """q, k, v: (B, S, H*Dp) -> (B, S, H*Dp)."""
    b, s, w = q.shape
    bq = _single_bq(s, w, q.dtype.itemsize)
    if bq:
        return _flash_merged_single(
            q, k, v, scale=scale, num_heads=num_heads, head_dim=head_dim, bq=bq
        )
    return _flash_merged_online(q, k, v, scale=scale, num_heads=num_heads, head_dim=head_dim)


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, head_dim, kv_len):
    """One fused logits-softmax-PV step per (batch, q-block); the full padded
    K/V block (<=128 x width) rides in VMEM via its BlockSpec.  Padded kv
    rows are masked to -inf before the softmax."""
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]   # (BQ, Dp) bf16
        k = k_ref[0, :, sl]   # (SKp, Dp)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, SKp) f32
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _flash_cross_merged(q, k, v, *, scale, num_heads, head_dim, kv_len):
    """q: (B, Sq, W); k, v: (B, SKp, W) with SKp the 128-padded kv length."""
    b, sq, w = q.shape
    skp = k.shape[1]
    # Tall q blocks: the K/V block is tiny (<=128 rows), so per-step cost is
    # dominated by per-dot overhead — M=2048 rows keeps the MXU streaming
    # (q + out blocks ~2 MB each at w=512; logits bq x 128 f32 ~1 MB)
    bq = 2048 if w <= 640 else 512
    while bq > 128 and sq % bq:
        bq //= 2
    bq = min(bq, sq)
    grid = (b, sq // bq)
    kernel = functools.partial(
        _cross_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim,
        kv_len=kv_len,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, skp, w), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, skp, w), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, w), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, w), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * skp * w,
            bytes_accessed=2 * b * sq * w * q.dtype.itemsize,
            transcendentals=b * num_heads * sq * skp,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_cross(q, k, v, scale):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dp = _padded_dim(d)
    skp = 128
    if dp != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
        q, k, v = (jnp.pad(x, p) for x, p in ((q, pad), (k, pad), (v, pad)))
    if skp != sk:
        kvpad = [(0, 0), (0, skp - sk), (0, 0), (0, 0)]
        k = jnp.pad(k, kvpad)
        v = jnp.pad(v, kvpad)
    o = _flash_cross_merged(
        q.reshape(b, sq, h * dp), k.reshape(b, skp, h * dp), v.reshape(b, skp, h * dp),
        scale=scale, num_heads=h, head_dim=dp, kv_len=sk,
    ).reshape(b, sq, h, dp)
    if dp != d:
        o = o[..., :d]
    return o


def _flash_cross_fwd(q, k, v, scale):
    return _flash_cross(q, k, v, scale), (q, k, v)


def _flash_cross_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_ref(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash_cross.defvjp(_flash_cross_fwd, _flash_cross_bwd)


def flash_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused short-KV cross attention over (B, S, H, D) tensors."""
    if not cross_supported(q, k):
        raise ValueError(f"unsupported cross shape q={q.shape} k={k.shape}")
    d = q.shape[-1]
    return _flash_cross(q, k, v, d ** -0.5 if scale is None else scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    b, s, h, d = q.shape
    dp = _padded_dim(d)
    if dp != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    # (B, S, H, Dp) -> (B, S, H*Dp): minor-dims merge, no data movement
    q, k, v = (x.reshape(b, s, h * dp) for x in (q, k, v))
    # Mosaic requires DMA/scratch views to be 128-aligned on the lane dim;
    # pad the merged width (e.g. 5 heads x 64 = 320 -> 384).  The pad columns
    # are zeros and live past every per-head slice, so they never mix in.
    w = h * dp
    wp = (w + 127) // 128 * 128
    if wp != w:
        wpad = [(0, 0), (0, 0), (0, wp - w)]
        q, k, v = (jnp.pad(x, wpad) for x in (q, k, v))
    o = _flash_merged(q, k, v, scale=scale, num_heads=h, head_dim=dp)
    if wp != w:
        o = o[..., :w]
    o = o.reshape(b, s, h, dp)
    if dp != d:
        o = o[..., :d]
    return o


def _xla_ref(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * jnp.float32(scale), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    # the Pallas kernels emit q.dtype; the recompute-based VJP must agree on
    # the output aval even when k/v arrive in a different dtype (e.g. f32
    # LoRA-merged q against frozen bf16 text k/v in training)
    return out.astype(q.dtype)


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


# ---------------------------------------------------------------------------
# Pre-merged (weight-padded) entries: q/k/v arrive already in the kernel's
# (B, S, W) layout with heads at stride ``head_dim`` and W 128-aligned —
# the caller folded the per-head zero-padding into its projection WEIGHTS
# (hoisted out of the scan by XLA), so no per-step pad/reshape data movement
# happens at all.  models/attention.py builds these layouts.
# ---------------------------------------------------------------------------


def premerged_width(num_heads: int, d: int) -> int:
    """The padded merged width W the caller must produce: heads padded to
    dp = _padded_dim(d), then W rounded up to a 128 multiple."""
    dp = _padded_dim(d)
    if dp == 0:
        return 0
    return (num_heads * dp + 127) // 128 * 128


def premerged_self_supported(b: int, s: int, num_heads: int, d: int,
                             itemsize: int = 2) -> bool:
    w = premerged_width(num_heads, d)
    if w == 0 or s < 128:
        return False
    if _single_bq(s, w, itemsize):
        return True
    bq, bk = _pick_blocks(s, w, itemsize)
    return s % bq == 0 and s % bk == 0


def premerged_cross_supported(b, sq, sk, num_heads: int, d: int) -> bool:
    w = premerged_width(num_heads, d)
    if w == 0 or w > 2048 or sk > 128:
        return False
    return sq >= 128 and sq % 128 == 0


def _xla_ref_premerged(q, k, v, scale, num_heads, head_dim):
    b, s, w = q.shape

    def split(x):
        return x[:, :, : num_heads * head_dim].reshape(
            x.shape[0], x.shape[1], num_heads, head_dim
        )

    o = _xla_ref(split(q), split(k), split(v), scale)
    o = o.reshape(b, s, num_heads * head_dim)
    if w != num_heads * head_dim:
        o = jnp.pad(o, ((0, 0), (0, 0), (0, w - num_heads * head_dim)))
    return o


# ---------------------------------------------------------------------------
# Fused flash backward (FlashAttention-2 style, two kernels).  The reference
# depends on the flash_attn CUDA wheel's fused backward for training
# (models/unet/attention.py:52-67); this is the TPU equivalent.
#
# Pass A (grid (b, q_blocks)): full K/V resident in VMEM scratch (same DMA
# design as the single-pass forward).  Per q block it recomputes the row
# softmax exactly, emits dQ, and writes LSE + delta = rowsum(dO*O) per head
# for pass B — so the forward never needs to store statistics.
# Pass B (grid (b, kv_blocks, q_blocks), q innermost): per kv block it
# accumulates dK = sum_i dS^T Q_i and dV = sum_i P^T dO_i in f32 VMEM,
# normalizing P directly via exp(S - LSE).
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, do_ref, o_ref, k_hbm, v_hbm,
                   dq_ref, lse_ref, delta_ref, kv_ref, sem, *,
                   scale, num_heads, head_dim):
    g = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _load_kv():
        ck = pltpu.make_async_copy(k_hbm.at[g], kv_ref.at[0], sem.at[0])
        cv = pltpu.make_async_copy(v_hbm.at[g], kv_ref.at[1], sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    if dq_ref.shape[-1] != num_heads * head_dim:
        # padded tail lanes past the last head are never touched by the
        # per-head slices below; zero the whole block first so they read as
        # zeros downstream (a tail-only store could be lane-unaligned)
        dq_ref[0] = jnp.zeros_like(dq_ref[0])
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        do = do_ref[0, :, sl]
        o = o_ref[0, :, sl]
        k = kv_ref[0, :, sl]
        v = kv_ref[1, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, S) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, S) f32
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
        )  # (BQ, 1)
        ds = (p / l) * (dp - delta) * scale
        dq = jax.lax.dot_general(
            ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        lse_ref[0, :, h : h + 1] = m + jnp.log(l)
        delta_ref[0, :, h : h + 1] = delta


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale, num_heads, head_dim):
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl]
        do = do_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK) f32
        p = jnp.exp(s - lse_ref[0, :, h : h + 1])  # normalized probs
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0, :, h : h + 1]) * scale
        dk_acc[:, sl] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == ni - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


_BWD_BUDGET = int(13.5 * 1024 * 1024)


def _bwd_blocks(s: int, w: int, itemsize: int):
    """(bq_a, bq_b, bk_b) for the two backward passes, or None if the
    resident-K/V design doesn't fit (falls back to the XLA recompute VJP)."""
    kv = 2 * s * w * itemsize
    bq_a = None
    for bq in (128, 64):
        if s % bq:
            continue
        temps = 3 * bq * s * 4 + bq * s * itemsize  # s/p reuse, dp, ds
        blocks = 2 * 4 * bq * w * itemsize + 2 * bq * 128 * 4
        if kv + temps + blocks < _BWD_BUDGET:
            bq_a = bq
            break
    if bq_a is None:
        return None
    for bk in (512, 256, 128):
        if s % bk:
            continue
        bq = min(bk, 256)
        while s % bq:
            bq //= 2
        acc = 2 * bk * w * 4
        blocks = 2 * 2 * bq * w * itemsize + 2 * 2 * bk * w * itemsize
        temps = 3 * bq * bk * 4
        if acc + blocks + temps < _BWD_BUDGET:
            return bq_a, bq, bk
    return None


def bwd_premerged_supported(b: int, s: int, w: int, itemsize: int = 2) -> bool:
    """Measured envelope (/tmp/flash_bwd_check.py on v5e): the fused backward
    beats the XLA recompute VJP 2.6-3.5x at s=1024/4096 (b4: 4.7 vs 12.3 ms
    at s4096 w512; 0.15 vs 0.51 at s1024 w1024); at s=256 the resident-K/V
    grid is too small to win, so short sequences keep the XLA path."""
    return s >= 512 and _bwd_blocks(s, w, itemsize) is not None


def _premerged_flash_bwd(q, k, v, o, g, scale, num_heads, head_dim):
    b, s, w = q.shape
    bq_a, bq_b, bk_b = _bwd_blocks(s, w, q.dtype.itemsize)
    kern_a = functools.partial(
        _bwd_dq_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim
    )
    dq, lse, delta = pl.pallas_call(
        kern_a,
        grid=(b, s // bq_a),
        in_specs=[
            pl.BlockSpec((1, bq_a, w), lambda gg, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_a, w), lambda gg, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_a, w), lambda gg, i: (gg, i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bq_a, w), lambda gg, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_a, 128), lambda gg, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_a, 128), lambda gg, i: (gg, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), q.dtype),
            jax.ShapeDtypeStruct((b, s, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, s, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, s, w), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * s * s * w,
            bytes_accessed=6 * b * s * w * q.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
    )(q, g, o, k, v)

    kern_b = functools.partial(
        _bwd_dkv_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim
    )
    dk, dv = pl.pallas_call(
        kern_b,
        grid=(b, s // bk_b, s // bq_b),
        in_specs=[
            pl.BlockSpec((1, bq_b, w), lambda gg, j, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_b, w), lambda gg, j, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_b, 128), lambda gg, j, i: (gg, i, 0)),
            pl.BlockSpec((1, bq_b, 128), lambda gg, j, i: (gg, i, 0)),
            pl.BlockSpec((1, bk_b, w), lambda gg, j, i: (gg, j, 0)),
            pl.BlockSpec((1, bk_b, w), lambda gg, j, i: (gg, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk_b, w), lambda gg, j, i: (gg, j, 0)),
            pl.BlockSpec((1, bk_b, w), lambda gg, j, i: (gg, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), q.dtype),
            jax.ShapeDtypeStruct((b, s, w), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk_b, w), jnp.float32),
            pltpu.VMEM((bk_b, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * s * s * w,
            bytes_accessed=6 * b * s * w * q.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
    )(q, g, lse, delta, k, v)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_self_premerged(q, k, v, scale, num_heads, head_dim):
    return _flash_merged(q, k, v, scale=scale, num_heads=num_heads, head_dim=head_dim)


def _self_premerged_fwd(q, k, v, scale, num_heads, head_dim):
    o = _flash_self_premerged(q, k, v, scale, num_heads, head_dim)
    return o, (q, k, v, o)


def _self_premerged_bwd(scale, num_heads, head_dim, res, g):
    q, k, v, o = res
    b, s, w = q.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and bwd_premerged_supported(b, s, w, q.dtype.itemsize):
        return _premerged_flash_bwd(q, k, v, o, g, scale, num_heads, head_dim)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_ref_premerged(q_, k_, v_, scale, num_heads, head_dim),
        q, k, v,
    )
    return vjp(g)


_flash_self_premerged.defvjp(_self_premerged_fwd, _self_premerged_bwd)


def flash_self_premerged(q, k, v, *, scale, num_heads, head_dim):
    """Self-attention over (B, S, W) weight-padded merged tensors."""
    return _flash_self_premerged(q, k, v, scale, num_heads, head_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_cross_premerged(q, k, v, scale, num_heads, head_dim, kv_len):
    b, sq, w = q.shape
    skp = 128
    sk = k.shape[1]
    if sk != skp:
        kvpad = [(0, 0), (0, skp - sk), (0, 0)]
        k = jnp.pad(k, kvpad)
        v = jnp.pad(v, kvpad)
    return _flash_cross_merged(
        q, k, v, scale=scale, num_heads=num_heads, head_dim=head_dim, kv_len=kv_len
    )


def _cross_premerged_fwd(q, k, v, scale, num_heads, head_dim, kv_len):
    return _flash_cross_premerged(q, k, v, scale, num_heads, head_dim, kv_len), (q, k, v)


def _cross_premerged_bwd(scale, num_heads, head_dim, kv_len, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_ref_premerged(q_, k_, v_, scale, num_heads, head_dim),
        q, k, v,
    )
    return vjp(g)


_flash_cross_premerged.defvjp(_cross_premerged_fwd, _cross_premerged_bwd)


def flash_cross_premerged(q, k, v, *, scale, num_heads, head_dim, kv_len):
    """Short-KV cross attention over (B, Sq, W) / (B, Sk<=128, W) merged
    tensors; only the tiny K/V rows are padded per step."""
    return _flash_cross_premerged(q, k, v, scale, num_heads, head_dim, kv_len)
