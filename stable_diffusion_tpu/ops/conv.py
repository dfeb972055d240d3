"""Pallas TPU 3x3 convolution (the UNet/VAE resblock hot op).

XLA's conv emitter delivers ~15 TF/s on the SD resblock shapes inside the
full denoise program (measured via op_profile, benchmarks/microbench_unet.py)
— ~7% of the MXU.  This kernel reformulates conv3x3 as three tap matmuls
over a width-im2col view and runs near matmul rate:

  * Host side builds ``x3 = concat(x[:, :, 0:W], x[:, :, 1:W+1], x[:, :, 2:W+2],
    axis=-1)`` from the spatially padded input — shape (B, H+2, W, 3C).  The
    kernel kernel is then a plain dense matmul per vertical tap: no in-kernel
    lane/sublane shifting (Mosaic restricts those), K = 3C keeps the MXU fed.
  * Grid walks (batch, row-blocks, cout-blocks), cout innermost.  The input
    row window (BH+2, W, 3C) is DMA'd to VMEM scratch ONCE per row-block and
    reused across all cout blocks; weights stream through the normal
    BlockSpec pipeline.
  * The vertical taps are slices on the untiled row dim of the scratch —
    always legal — feeding three (BH*W, 3C) x (3C, BN) MXU matmuls with f32
    accumulation; bias is fused into the epilogue.

Replaces the reference's ``nn.Conv2d`` calls inside ResBlocks
(reference models/unet/unet.py:153-195, models/vae/resnet.py:5-39).
Stride-2 / asymmetric-pad convs (down/upsample) keep the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x3_hbm, w_ref, b_ref, o_ref, xwin, sem, acc_ref, *,
                    bh: int, w: int, kc: int, n_i: int, n_win: int, n_k: int):
    g = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.program_id(2)
    k = pl.program_id(3)

    def _copy(win_idx, slot):
        # rows [i*bh, i*bh + bh + 2) of the padded input for window win_idx
        # (= g*n_i + i): row dim is untiled, arbitrary offsets are DMA-legal
        gg = win_idx // n_i
        ii = win_idx - gg * n_i
        return pltpu.make_async_copy(
            x3_hbm.at[gg, pl.ds(ii * bh, bh + 2)], xwin.at[slot], sem.at[slot]
        )

    win = g * n_i + i
    slot = jax.lax.rem(win, 2)

    @pl.when(jnp.logical_and(n == 0, k == 0))
    def _load():
        # double-buffered input windows: window 0 is copied synchronously,
        # each window then prefetches its successor so the DMA for window
        # w+1 overlaps the 9 tap matmuls of window w
        @pl.when(win == 0)
        def _first():
            _copy(win, slot).start()

        _copy(win, slot).wait()

        @pl.when(win + 1 < n_win)
        def _prefetch():
            _copy(win + 1, 1 - slot).start()

    for dy in range(3):
        # K-blocked tap matmul: lanes [k*kc, (k+1)*kc) of the im2col window
        # against weight rows of the same K range (kc is a 128 multiple, so
        # the lane slice is always aligned; sliced on the ref — value-level
        # dynamic_slice has no Pallas lowering)
        if n_k > 1:
            xs = xwin[slot, pl.ds(dy, bh), :, pl.ds(k * kc, kc)].reshape(bh * w, kc)
        else:
            xs = xwin[slot, pl.ds(dy, bh)].reshape(bh * w, kc)
        part = jax.lax.dot_general(
            xs, w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dy == 0:
            if n_k > 1:
                acc_ref[:] = jnp.where(k == 0, part, acc_ref[:] + part)
            else:
                acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    @pl.when(k == n_k - 1)
    def _store():
        acc = acc_ref[:] + b_ref[:]  # (BH*W, BN) + (1, BN)
        o_ref[0] = acc.astype(o_ref.dtype).reshape(bh, w, acc.shape[-1])


def _pick_blocks(h: int, w: int, c3: int, cout: int, itemsize: int):
    """Joint (bh, bn, kc) choice under one VMEM budget: 2-slot input window
    scratch + double-buffered weight blocks + f32 acc + double-buffered
    output blocks must fit.  kc < c3 enables K-blocked weights for big-K
    skip-concat convs whose full weight slab cannot fit (e.g. 2560->1280 at
    16^2: 59 MB of weights stream in (3, kc, bn) blocks while the full-K
    input window stays resident).  Returns (0, 0, 0) when nothing fits."""
    # 16 MB VMEM minus ~4 MB empirical headroom for Mosaic stack temporaries
    # (the dot result and reshaped tap views are not modeled below; a 14 MB
    # budget compiled to a measured 16.3 MB allocation and OOM'd)
    budget = 12 * 1024 * 1024
    lane = 128  # lane padding on the c3 dim inside VMEM

    def win_bytes(bh):
        c3p = (c3 + lane - 1) // lane * lane
        return (bh + 2) * w * c3p * itemsize

    # bn must be the full cout or a 128 multiple (Pallas block divisibility)
    def bns():
        for bn in (cout, 1280, 640, 512, 384, 256, 128):
            if bn != cout and bn % lane:
                continue
            if bn > cout or cout % bn:
                continue
            yield bn

    def kcs():
        # kc = c3 (no K blocking) or a 128-multiple divisor of c3
        yield c3
        kc = (c3 // 2 + lane - 1) // lane * lane
        while kc >= 512:
            if c3 % kc == 0:
                yield kc
            kc -= lane

    def fits(bh, bn, kc):
        wt = 2 * 3 * kc * bn * itemsize  # double-buffered
        acc = bh * w * bn * 4
        outb = 2 * bh * w * bn * itemsize
        return 2 * win_bytes(bh) + wt + acc + outb <= budget

    # prefer: no K blocking, then the largest row block with M = bh*w >= 256
    # (smaller M underfills the MXU sublanes), then the widest bn
    for kc in kcs():
        bh = h
        while bh >= 2 and bh * w >= 256:
            if h % bh == 0:
                for bn in bns():
                    if fits(bh, bn, kc):
                        return bh, bn, kc
            bh //= 2
    return 0, 0, 0



def _plan(h: int, w: int, c: int, cout: int, itemsize: int):
    """(c3p, bh, bn, kc) — pads K = 3C up to the smallest alignment that
    yields a feasible block plan.  Escalating the pad to a 512/1024 multiple
    unlocks K-block divisors when 3C's 128-multiple has none (e.g. 3*960 =
    2880 -> 2944 = 23*128, prime in 128s; 3072 = 24*128 splits cleanly)."""
    for align in (128, 512, 1024):
        c3p = (3 * c + align - 1) // align * align
        bh, bn, kc = _pick_blocks(h, w, c3p, cout, itemsize)
        if bh:
            return c3p, bh, bn, kc
    return 0, 0, 0, 0


# Measured win envelope bounds (see supported()); module-level so
# microbenches can A/B the kernel beyond them (benchmarks/microbench_*.py)
MAX_KERNEL_BATCH = 4
MIN_AREA = 256
MAX_AREA = 9216
MIN_CHANNELS = 320
# VAE large-spatial envelope (see supported()): at batch 1-2 in-program XLA
# runs the decoder convs at 27-37 TF/s in T(2,128) layouts while this kernel
# keeps its standalone rate — full decode ms/img measured
# (benchmarks/microbench_vae_decode.py + /tmp A/B, ms/img kernel vs XLA):
#   b1 34.2/79.0  b2 39.8/45.5  b4 41.2/30.1  b8 43.1/22.0  b32 47.8/21.9
# At batch >= 4 XLA's conv gets tall M and escapes the degradation, so the
# envelope caps at batch 2 (the b1 headline + b2 CFG shapes) for INFERENCE
# programs.  The TRAIN step is different: the round-4 full-step profile
# showed XLA's b4 VAE-encoder convs dragging ~55 ms/step of T(8,128)<->
# T(4,128) relayout copy/bitcast fusions into the program (copy 31.9 +
# bitcast 22.2 ms of 164.7; the convs themselves were fine) — so the train
# step requests a higher cap via large_max_batch (vae.encode(train_batch=)
# threads it through), keeping layout coherence with the Pallas path.
LARGE_MAX_AREA = 768 * 768
LARGE_MIN_CHANNELS = 128
LARGE_MAX_BATCH = 2


def supported(x: jax.Array, kernel: jax.Array, stride: int, padding,
              max_batch: int | None = None) -> bool:
    if x.ndim != 4 or kernel.shape[:2] != (3, 3) or stride != 1:
        return False
    if padding not in ("SAME", 1, ((1, 1), (1, 1))):
        return False
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    # The in-kernel (bh, W, C3) -> (bh*W, C3) reshape merges W into the
    # sublane dim, so W should respect the bf16 (16, 128) tile.  W % 16 == 0
    # covers every SD stage width except the 768^2 config's 24^2 stage, whose
    # W = 24 is explicitly bench-validated (BASELINE.md round-2 768 numbers) —
    # admit exactly that case rather than any W % 8.
    if w % 16 and w != 24:
        return False
    # Measured envelope.  Standalone (benchmarks/microbench_conv.py) the
    # kernel only wins at 32^2..64^2 with moderate K — but IN-PROGRAM a
    # mixed kernel/XLA conv path loses more to layout churn (XLA assigns
    # T(2,128) spatial layouts around its convs, forcing relayouts at every
    # Pallas boundary) than the slower shapes cost: full-step time is 18.9 ms
    # with the kernel on all 16^2..96^2 resblock convs vs 21.7 ms with only
    # the standalone winners.  So: keep layout coherence for model batch <= 4;
    # at batch >= 8 (serving/one-step configs) XLA wins in-program too, and
    # bandwidth-bound large-spatial/small-C VAE shapes (256^2+) stay XLA.
    small = (MIN_AREA <= h * w <= MAX_AREA and c >= MIN_CHANNELS
             and b <= (max_batch if max_batch is not None
                       else MAX_KERNEL_BATCH))
    # VAE encoder/decoder large-spatial shapes (128^2..768^2, C 128..512):
    # measured 2.3x on the full 512^2 decode (microbench_vae_decode.py).
    # cout >= 128 keeps the tiny-N output head (128->3) on XLA, where a
    # bn=cout=3 block would run lanes 2% full.
    large = (MAX_AREA < h * w <= LARGE_MAX_AREA and c >= LARGE_MIN_CHANNELS
             and cout >= 128 and b <= LARGE_MAX_BATCH)
    if not (small or large):
        return False
    # big-K concat shapes where the XLA im2col dot is measured faster than
    # this kernel route there instead (models/layers.use_im2col_conv)
    from stable_diffusion_tpu.models.layers import use_im2col_conv

    if use_im2col_conv(x.shape, kernel.shape):
        return False
    c3p, bh, bn, kc = _plan(h, w, c, cout, x.dtype.itemsize)
    return bh > 0 and bn > 0


def _conv3x3_call(x3, w3, bias, *, bh: int, bn: int, kc: int, h: int, out_dtype):
    b, hp2, w, c3 = x3.shape
    cout = w3.shape[-1]
    n_k = c3 // kc
    grid = (b, h // bh, cout // bn, n_k)
    n_i = h // bh
    kernel = functools.partial(
        _conv3x3_kernel, bh=bh, w=w, kc=kc, n_i=n_i, n_win=b * n_i, n_k=n_k
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, kc, bn), lambda g, i, n, k: (0, k, n)),
            pl.BlockSpec((1, bn), lambda g, i, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, bn), lambda g, i, n, k: (g, i, 0, n)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, w, c3), x3.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bh * w, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # all arbitrary: the prefetch chain assumes sequential window order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c3 * 3 * cout,
            bytes_accessed=(b * hp2 * w * c3 + b * h * w * cout) * x3.dtype.itemsize,
            transcendentals=0,
        ),
    )(x3, w3, bias)


# The width-im2col build materializes x3 = (B, H+2, W, 3C) in HBM — 3x the
# input bytes.  At serving batches on VAE large-spatial shapes that explodes
# (b32 512^2 C256: 12 GB); chunk the batch through lax.map so only one
# chunk's x3 is live at a time (the pallas grid was batch-sequential anyway).
_X3_MAX_BYTES = 1792 * 1024 * 1024


def _conv3x3_impl(x, kernel, bias):
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # width-im2col: (B, H+2, W, 3C), tap-major (dx) blocks of C — matches
    # kernel.reshape(3, 3C, cout)'s (dx, c) row ordering
    x3 = jnp.concatenate(
        [xp[:, :, 0:w, :], xp[:, :, 1 : w + 1, :], xp[:, :, 2 : w + 2, :]],
        axis=-1,
    )
    w3 = kernel.astype(x.dtype).reshape(3, 3 * c, cout)
    # Mosaic DMA slices must be 128-aligned on the lane dim: pad K = 3C up
    # (e.g. 960 -> 1024); the zero K rows contribute nothing to the matmul.
    # _plan may escalate the pad further to unlock K-block divisors.
    c3p, bh, bn, kc = _plan(h, w, c, cout, x.dtype.itemsize)
    if c3p != 3 * c:
        x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, c3p - 3 * c)))
        w3 = jnp.pad(w3, ((0, 0), (0, c3p - 3 * c), (0, 0)))
    b2 = (bias if bias is not None else jnp.zeros((cout,), x.dtype))
    b2 = b2.astype(jnp.float32).reshape(1, cout)
    return _conv3x3_call(x3, w3, b2, bh=bh, bn=bn, kc=kc, h=h, out_dtype=x.dtype)


def _batch_chunk(b: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of b whose x3 slab stays under _X3_MAX_BYTES."""
    c3p = (3 * c + 127) // 128 * 128
    per = (h + 2) * w * c3p * itemsize
    bc = b
    while bc > 1 and (bc * per > _X3_MAX_BYTES or b % bc):
        bc -= 1
    return bc


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _conv3x3(x, kernel, bias):
    from stable_diffusion_tpu.ops import winograd as wg

    b, h, w, c = x.shape
    if wg.route(x, kernel, 1, "SAME"):
        # opt-in (SD_TPU_WINOGRAD=1): 2.25x fewer MXU FLOPs, input read once.
        # Batch-chunk the host-side xw slab like the tap kernel's x3 below.
        bc = wg.batch_chunk(b, h, w, c, x.dtype.itemsize)
        if bc < b:
            xs = x.reshape(b // bc, bc, h, w, c)
            y = jax.lax.map(
                lambda xc: wg.conv3x3_winograd(xc, kernel, bias), xs)
            return y.reshape(b, h, w, kernel.shape[-1])
        return wg.conv3x3_winograd(x, kernel, bias)
    bc = _batch_chunk(b, h, w, c, x.dtype.itemsize)
    if bc < b:
        xs = x.reshape(b // bc, bc, h, w, c)
        y = jax.lax.map(lambda xc: _conv3x3_impl(xc, kernel, bias), xs)
        return y.reshape(b, h, w, kernel.shape[-1])
    return _conv3x3_impl(x, kernel, bias)


def _conv3x3_q_kernel(x3_hbm, w_ref, s_ref, b_ref, o_ref, xwin, sem, acc_ref, *,
                      bh: int, w: int, kc: int, n_i: int, n_win: int, n_k: int):
    """int8 x int8 -> int32 variant (static W8A8): the im2col windows are
    int8 in HBM (half the DMA bytes of bf16) and the tap matmuls run at the
    MXU's double int8 rate; the epilogue applies the folded
    act_scale * per-channel weight scale and bias in f32."""
    g = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.program_id(2)
    k = pl.program_id(3)

    def _copy(win_idx, slot):
        gg = win_idx // n_i
        ii = win_idx - gg * n_i
        return pltpu.make_async_copy(
            x3_hbm.at[gg, pl.ds(ii * bh, bh + 2)], xwin.at[slot], sem.at[slot]
        )

    win = g * n_i + i
    slot = jax.lax.rem(win, 2)

    @pl.when(jnp.logical_and(n == 0, k == 0))
    def _load():
        @pl.when(win == 0)
        def _first():
            _copy(win, slot).start()

        _copy(win, slot).wait()

        @pl.when(win + 1 < n_win)
        def _prefetch():
            _copy(win + 1, 1 - slot).start()

    for dy in range(3):
        if n_k > 1:
            xs = xwin[slot, pl.ds(dy, bh), :, pl.ds(k * kc, kc)].reshape(bh * w, kc)
        else:
            xs = xwin[slot, pl.ds(dy, bh)].reshape(bh * w, kc)
        part = jax.lax.dot_general(
            xs, w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if dy == 0:
            if n_k > 1:
                acc_ref[:] = jnp.where(k == 0, part, acc_ref[:] + part)
            else:
                acc_ref[:] = part
        else:
            acc_ref[:] = acc_ref[:] + part

    @pl.when(k == n_k - 1)
    def _store():
        acc = acc_ref[:].astype(jnp.float32) * s_ref[:] + b_ref[:]
        o_ref[0] = acc.astype(o_ref.dtype).reshape(bh, w, acc.shape[-1])


def _conv3x3_q_call(x3, w3, scales, bias, *, bh, bn, kc, h, out_dtype):
    b, hp2, w, c3 = x3.shape
    cout = w3.shape[-1]
    n_k = c3 // kc
    grid = (b, h // bh, cout // bn, n_k)
    n_i = h // bh
    kernel = functools.partial(
        _conv3x3_q_kernel, bh=bh, w=w, kc=kc, n_i=n_i, n_win=b * n_i, n_k=n_k
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, kc, bn), lambda g, i, n, k: (0, k, n)),
            pl.BlockSpec((1, bn), lambda g, i, n, k: (0, n)),
            pl.BlockSpec((1, bn), lambda g, i, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, bn), lambda g, i, n, k: (g, i, 0, n)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, w, c3), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bh * w, bn), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c3 * 3 * cout,
            bytes_accessed=b * hp2 * w * c3 + b * h * w * cout * 2,
            transcendentals=0,
        ),
    )(x3, w3, scales, bias)


# int8 halves the im2col DMA bytes, so the serving-batch trade differs from
# bf16: measured (microbench_conv_batch.py main_int8, round 3) the int8
# kernel beats the XLA bf16 dequantized conv at model batch 8 (64^2 c320
# 1.19 vs 1.28 ms; 32^2 c640 1.07 vs 1.20); at batch >= 16 the 64^2 stage
# ties/loses (b16: 1.675 vs 1.660) while the 32^2 stage keeps winning at
# b32 (1.84 vs 2.15, +17%).  The quant envelope therefore admits batch <= 8
# everywhere and batch <= 32 for the small-area (<= 32^2) stages.
# (In-program confirmation: full-W8A8 b4 txt2img 1.216 -> 1.246 img/s.)
MAX_QUANT_BATCH = 8
MAX_QUANT_BATCH_SMALL = 32
QUANT_SMALL_AREA = 1024


def quant_supported(x, kernel_q, stride: int, padding) -> bool:
    """W8A8 kernel coverage: the bf16 envelope (with its own batch caps, see
    MAX_QUANT_BATCH*) plus int8 tiling constraints (sublane dim = W must be
    a multiple of 32 for the (32, 128) int8 tile)."""
    cap = (MAX_QUANT_BATCH_SMALL
           if x.shape[1] * x.shape[2] <= QUANT_SMALL_AREA
           else MAX_QUANT_BATCH)
    if not supported(x, kernel_q, stride, padding,
                     max_batch=max(cap, MAX_KERNEL_BATCH)):
        return False
    return x.shape[2] % 32 == 0


def _conv3x3_q_impl(xq, kernel_q, scales, b2, out_dtype):
    b, h, w, c = xq.shape
    cout = kernel_q.shape[-1]
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x3 = jnp.concatenate(
        [xp[:, :, 0:w, :], xp[:, :, 1 : w + 1, :], xp[:, :, 2 : w + 2, :]],
        axis=-1,
    )
    w3 = kernel_q.reshape(3, 3 * c, cout)
    c3p, bh, bn, kc = _plan(h, w, c, cout, 1)
    if c3p != 3 * c:
        x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, 0), (0, c3p - 3 * c)))
        w3 = jnp.pad(w3, ((0, 0), (0, c3p - 3 * c), (0, 0)))
    return _conv3x3_q_call(
        x3, w3, scales, b2, bh=bh, bn=bn, kc=kc, h=h, out_dtype=out_dtype
    )


@jax.custom_vjp
def _conv3x3_q(xn, kernel_q, kernel_scale, act_scale, bias):
    """xn: normalized activations (bf16/f32); weights int8 HWIO; act_scale
    scalar f32 (calibrated absmax); kernel_scale (1,1,1,Cout)-broadcastable.

    Inference only: differentiating through the round/clip quantizer would
    silently produce zero gradients, so the VJP raises (train on the bf16
    path and quantize afterwards)."""
    b, h, w, c = xn.shape
    cout = kernel_q.shape[-1]
    s_x = jnp.maximum(act_scale.astype(jnp.float32) / 127.0, 1e-12)
    xq = jnp.round(
        jnp.clip(xn.astype(jnp.float32) / s_x, -127.0, 127.0)
    ).astype(jnp.int8)
    scales = (s_x * kernel_scale.astype(jnp.float32).reshape(-1)).reshape(1, cout)
    b2 = (bias if bias is not None else jnp.zeros((cout,), xn.dtype))
    b2 = b2.astype(jnp.float32).reshape(1, cout)
    bc = _batch_chunk(b, h, w, c, 1)
    if bc < b:
        xs = xq.reshape(b // bc, bc, h, w, c)
        y = jax.lax.map(
            lambda xc: _conv3x3_q_impl(xc, kernel_q, scales, b2, xn.dtype), xs
        )
        return y.reshape(b, h, w, cout)
    return _conv3x3_q_impl(xq, kernel_q, scales, b2, xn.dtype)


def _conv3x3_q_fwd(xn, kernel_q, kernel_scale, act_scale, bias):
    return _conv3x3_q(xn, kernel_q, kernel_scale, act_scale, bias), None


def _conv3x3_q_bwd(res, g):
    raise NotImplementedError(
        "W8A8 conv is inference-only: gradients through the int8 round/clip "
        "quantizer would be silently wrong — train with bf16 kernels and "
        "quantize afterwards (utils/quantize_model.quantize_convs)"
    )


_conv3x3_q.defvjp(_conv3x3_q_fwd, _conv3x3_q_bwd)


def _xla_conv(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _dx_via_forward() -> bool:
    """A/B gate for the split backward: dx through the forward Pallas/im2col
    dispatcher (default) vs the XLA transposed-conv vjp (SD_TPU_CONV_BWD=xla).

    Round 3 measured the two within 2% and shipped XLA (4.74 vs 4.82
    steps/s); the round-4 INTERLEAVED paired A/B (same process, alternating
    10-step blocks x2) flips it decisively: Pallas dx 168.5 / 167.9 ms/step
    vs XLA dx 172.8 / 189.8 — the XLA transposed conv drags the same
    T(8,128)<->T(4,128) relayout churn into the backward that the GN-route
    work found in the VAE (BASELINE.md round 4)."""
    return os.environ.get("SD_TPU_CONV_BWD", "pallas") == "pallas"


def _dx_conv(kernel, g):
    """Input gradient of a SAME 3x3 stride-1 conv IS such a conv with the
    spatially flipped, I/O-swapped kernel — route it through the forward
    dispatcher (Pallas/im2col where the envelope covers it)."""
    kb = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2)).astype(g.dtype)
    return conv3x3({"kernel": kb}, g)


def _gn_split_bwd(num_groups, eps, res, g):
    """Shared backward for the GN-SiLU-conv composites: dx via the Pallas/
    im2col forward dispatcher, dw/db and the GN-SiLU chain via the XLA vjp
    (the unused XLA dxn is dead-code-eliminated)."""
    from stable_diffusion_tpu.models import layers

    gamma, beta, x, kernel, bias = res
    if not _dx_via_forward():
        _, vjp = jax.vjp(
            lambda a, b, c, d, e: _gn_silu_conv_xla(a, b, c, d, e, num_groups, eps),
            gamma, beta, x, kernel, bias,
        )
        return vjp(g)

    def norm_silu(a, b, xx):
        y = layers.group_norm({"scale": a, "bias": b}, xx,
                              num_groups=num_groups, eps=eps)
        return layers.silu(y)

    xn, vjp_ns = jax.vjp(norm_silu, gamma, beta, x)
    _, vjp_conv = jax.vjp(_xla_conv, xn, kernel, bias)
    _, dw, db = vjp_conv(g)
    dxn = _dx_conv(kernel, g)
    dgamma, dbeta, dx = vjp_ns(dxn.astype(xn.dtype))
    return dgamma, dbeta, dx, dw, db


def _conv_fwd(x, kernel, bias):
    return _conv3x3(x, kernel, bias), (x, kernel, bias)


def _conv_bwd(res, g):
    """dx routes through the forward conv dispatcher with the spatially
    flipped, I/O-swapped kernel (a SAME 3x3 stride-1 conv's input gradient IS
    such a conv) — Pallas/im2col where the envelope covers it, instead of
    XLA's transposed-conv emitter.  dw/db keep the XLA vjp (dot-shaped
    contractions; the unused XLA dx is dead-code-eliminated)."""
    x, kernel, bias = res
    _, vjp = jax.vjp(_xla_conv, x, kernel, bias)
    if not _dx_via_forward():
        return vjp(g)
    _, dw, db = vjp(g)
    return _dx_conv(kernel, g), dw, db


_conv3x3.defvjp(_conv_fwd, _conv_bwd)


def _gn_silu_conv_xla(gamma, beta, x, kernel, bias, num_groups, eps):
    from stable_diffusion_tpu.models import layers

    y = layers.group_norm({"scale": gamma, "bias": beta}, x,
                          num_groups=num_groups, eps=eps)
    return _xla_conv(layers.silu(y), kernel, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gn_silu_conv(gamma, beta, x, kernel, bias, num_groups, eps):
    from stable_diffusion_tpu.ops.groupnorm import gn_scale_shift

    ss = gn_scale_shift({"scale": gamma, "bias": beta}, x,
                        num_groups=num_groups, eps=eps)  # (B, 2, C) f32
    xf = x.astype(jnp.float32)
    xn = xf * ss[:, 0][:, None, None, :] + ss[:, 1][:, None, None, :]
    xn = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
    # XLA fuses the normalize+SiLU into the pad/concat producer below, so the
    # separate GN normalize pass over HBM disappears entirely.
    return _conv3x3(xn, kernel, bias)


def _gn_conv_fwd(gamma, beta, x, kernel, bias, num_groups, eps):
    out = _gn_silu_conv(gamma, beta, x, kernel, bias, num_groups, eps)
    return out, (gamma, beta, x, kernel, bias)


_gn_silu_conv.defvjp(_gn_conv_fwd, _gn_split_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gn_silu_im2col(gamma, beta, x, kernel, bias, num_groups, eps):
    """GN-SiLU (stats via the Pallas GN kernel) + im2col-dot conv.  Wrapped
    in a custom VJP: the raw stats kernel has no JVP rule, so the backward
    recomputes through the pure-XLA formulation (like _gn_silu_conv)."""
    from stable_diffusion_tpu.ops.groupnorm import gn_scale_shift

    ss = gn_scale_shift({"scale": gamma, "bias": beta}, x,
                        num_groups=num_groups, eps=eps)
    xf = x.astype(jnp.float32)
    xn = xf * ss[:, 0][:, None, None, :] + ss[:, 1][:, None, None, :]
    xn = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
    from stable_diffusion_tpu.models import layers

    p = {"kernel": kernel}
    if bias is not None:
        p["bias"] = bias
    return layers.conv2d(p, xn)


def _gn_im2col_fwd(gamma, beta, x, kernel, bias, num_groups, eps):
    out = _gn_silu_im2col(gamma, beta, x, kernel, bias, num_groups, eps)
    return out, (gamma, beta, x, kernel, bias)


_gn_silu_im2col.defvjp(_gn_im2col_fwd, _gn_split_bwd)


def gn_silu_conv3x3(
    gn_params,
    conv_params,
    x: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    impl: str = "auto",
) -> jax.Array:
    """Fused GroupNorm -> SiLU -> conv3x3 (the resblock hot pattern,
    reference models/unet/unet.py:174-189).  Pallas conv kernel with the
    normalize+SiLU folded into its im2col build; stats via the streaming
    Pallas GN kernel.  Falls back to group_norm_silu + XLA conv off-TPU or
    for uncovered shapes.

    Static-W8A8 form: when ``conv_params`` carries {"kernel_q",
    "kernel_scale", "act_scale"} (utils/quantize_model.quantize_convs +
    calibration), the conv runs as int8 x int8 -> int32 tap matmuls — half
    the im2col DMA bytes and the MXU's double int8 rate (inference only)."""
    if _CAPTURE is not None:
        _capture_conv_input(gn_params, conv_params, x, num_groups, eps)
    bias = conv_params.get("bias")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    want = impl in ("pallas", "flash") or (impl == "auto" and on_tpu)
    quant = "kernel_q" in conv_params and "act_scale" in conv_params
    if (want and quant and x.shape[-1] % num_groups == 0
            and quant_supported(x, conv_params["kernel_q"], 1, "SAME")):
        from stable_diffusion_tpu.ops.groupnorm import gn_scale_shift

        ss = gn_scale_shift(gn_params, x, num_groups=num_groups, eps=eps)
        xf = x.astype(jnp.float32)
        xn = xf * ss[:, 0][:, None, None, :] + ss[:, 1][:, None, None, :]
        xn = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
        return _conv3x3_q(xn, conv_params["kernel_q"],
                          conv_params["kernel_scale"],
                          conv_params["act_scale"], bias)
    kernel = _materialize_kernel(conv_params, x.dtype)
    if (want and supported(x, kernel, 1, "SAME")
            and x.shape[-1] % num_groups == 0):
        return _gn_silu_conv(gn_params["scale"], gn_params["bias"], x,
                             kernel, bias, num_groups, eps)
    from stable_diffusion_tpu.models.layers import use_im2col_conv

    if (want and kernel.shape[:2] == (3, 3)
            and use_im2col_conv(x.shape, kernel.shape)
            and x.shape[-1] % num_groups == 0):
        # im2col-dot shapes: normalize+SiLU as XLA elementwise (fuses into
        # the im2col pad/concat producer), stats via the streaming GN kernel
        return _gn_silu_im2col(gn_params["scale"], gn_params["bias"], x,
                               kernel, bias, num_groups, eps)
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu

    # This branch's conv runs as an XLA spatial conv (kernel envelope and
    # im2col gate both declined); a Pallas GN custom call next to it pins
    # row-major layouts at its boundary and forces full-tensor relayouts.
    # Measured (round 4, /tmp ab_gn_route A/B on the VAE 512^2 stages): at
    # batch >= 8 the XLA GN wins decisively (b8 decode 130 vs 181 ms, b32
    # decode 503 vs 706, b32 encode 229 vs 340 — the one-step b32 device
    # floor moved 31.9 -> 39.9 img/s), while at batch <= 4 the Pallas GN
    # keeps winning (b4 encode 59 vs 95 ms: XLA's f32 stats copies cost
    # more than the relayouts).  Envelope: XLA GN at serving batches.
    gn_impl = "xla" if x.shape[0] >= 8 else impl
    h = group_norm_silu(gn_params, x, num_groups=num_groups, eps=eps,
                        silu=True, impl=gn_impl)
    from stable_diffusion_tpu.models import layers

    return layers.conv2d(dict(conv_params, kernel=kernel), h)


def _materialize_kernel(conv_params, dtype):
    """HWIO kernel from either the plain or the int8-quantized form (the
    dequant convert+mul fuses into the consuming conv/matmul)."""
    if "kernel" in conv_params:
        return conv_params["kernel"]
    return (conv_params["kernel_q"].astype(jnp.float32)
            * conv_params["kernel_scale"].astype(jnp.float32)).astype(dtype)


# Calibration hook (utils/quantize_model.calibrate_static_conv_activations):
# when set to a dict, every gn_silu_conv3x3 call records the post-GN-SiLU
# activation absmax of its conv input, keyed by the conv param subtree id.
_CAPTURE = None


def _capture_conv_input(gn_params, conv_params, x, num_groups, eps):
    from stable_diffusion_tpu.models import layers

    y = layers.group_norm(gn_params, x, num_groups=num_groups, eps=eps)
    y = layers.silu(y)
    a = float(jnp.max(jnp.abs(y.astype(jnp.float32))))
    key = id(conv_params)
    _CAPTURE[key] = max(_CAPTURE.get(key, 0.0), a)


def conv3x3(
    params,
    x: jax.Array,
    *,
    stride: int = 1,
    padding="SAME",
    impl: str = "auto",
) -> jax.Array:
    """Drop-in for ``layers.conv2d`` on 3x3 SAME stride-1 convs.

    impl: "xla" forces the XLA path; "pallas" requires kernel coverage;
    "auto" uses the kernel on TPU when the shape qualifies.
    """
    kernel = _materialize_kernel(params, x.dtype)
    bias = params.get("bias")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    want = impl in ("pallas", "flash") or (impl == "auto" and on_tpu)
    if want and supported(x, kernel, stride, padding):
        return _conv3x3(x, kernel, bias)
    if impl == "pallas":
        raise ValueError(f"conv3x3 kernel does not cover x={x.shape} k={kernel.shape}")
    from stable_diffusion_tpu.models import layers

    return layers.conv2d(dict(params, kernel=kernel), x, stride=stride, padding=padding)
