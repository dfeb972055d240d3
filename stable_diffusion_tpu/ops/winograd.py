"""Winograd F(2x2, 3x3) convolution (Pallas TPU).

The direct tap-matmul kernel (ops/conv.py) computes 9 multiply-accumulates
per output element and its host-side width-im2col writes the input 3x.
Winograd F(2x2,3x3) computes the same SAME/stride-1 conv with 16/4 = 4
multiplies per output (2.25x fewer MXU FLOPs) and reads the input once:

    Y = A^T [ (G w G^T) o (B^T d B) ] A        per 4x4 input tile (stride 2)

  * Host side pre-arranges the padded input as ``xw`` (B, H+2, W/2, 4*Cp):
    column tap b of tile tx lives at lanes [b*Cp, (b+1)*Cp) — in-kernel
    column access is then a 128-aligned lane slice (Cp = C padded to 128).
  * Grid walks (batch, tile-row bands, cout blocks, 16 Winograd positions).
    Per band the kernel builds the row-transform E[k1] = sum_a B^T[k1,a] d[a]
    once in f32 scratch; per position k=(k1,k2) the lane combine gives
    V_k, one (M, Cp) x (Cp, bn) MXU dot gives M_k, and M_k accumulates into
    the output-transform rows F[o1] with A^T coefficients on the fly — all
    16 M's never coexist.
  * Output is written in (B, 4, H/2, W/2, C) position-major layout; the
    host interleaves it back to NHWC with one XLA transpose (cheaper than
    stride-2 sublane writes, which Mosaic would relayout).

Numerics: transforms are exact in f32 (B/A entries are 0/±1); the single
bf16 rounding of V/U before the MXU matches the direct kernel's bf16
operand rounding.  Gated OFF by default (SD_TPU_WINOGRAD=1 enables) until
the on-chip microbench proves the win envelope.

Replaces the same reference convs as ops/conv.py (models/unet/unet.py:
153-195); backward recomputes through the XLA conv like _conv_bwd.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# B^T (4x4), G (4x3), A^T (2x4) — F(2,3) Winograd matrices
_BT = ((1, 0, -1, 0), (0, 1, 1, 0), (0, -1, 1, 0), (0, 1, 0, -1))
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))
_G = ((1.0, 0.0, 0.0), (0.5, 0.5, 0.5), (0.5, -0.5, 0.5), (0.0, 0.0, 1.0))


def transform_kernel(kernel: jax.Array, cp: int) -> jax.Array:
    """HWIO (3,3,Cin,Cout) -> (16, Cp, Cout) f32->bf16 Winograd weights,
    rows zero-padded Cin -> Cp.  Pure jnp; hoisted out of the denoise scan
    by XLA loop-invariant code motion like the premerged attention pads."""
    w = kernel.astype(jnp.float32)
    g = jnp.asarray(_G, jnp.float32)
    # U[a,b] = sum_{i,j} G[a,i] G[b,j] w[i,j]
    u = jnp.einsum("ai,bj,ijco->abco", g, g, w)
    cin, cout = w.shape[2], w.shape[3]
    u = u.reshape(16, cin, cout)
    if cp != cin:
        u = jnp.pad(u, ((0, 0), (0, cp - cin), (0, 0)))
    return u.astype(kernel.dtype)


def build_xw(x: jax.Array, cp: int) -> jax.Array:
    """NHWC (B,H,W,C) -> (B, H+2, W/2, 4*Cp) column-tap layout of the
    SAME-padded input: xw[n, r, tx, b*Cp + c] = xpad[n, r, 2*tx + b, c]."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for tb in range(4):
        # cols {2*tx + tb : tx < W/2}: slice [tb, tb + w - 1) step 2 has
        # exactly W/2 elements and stays inside the padded width W+2
        t = jax.lax.slice(
            xp, (0, 0, tb, 0), (b, h + 2, tb + w - 1, c), (1, 1, 2, 1)
        )  # (B, H+2, W/2, C)
        if cp != c:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
        taps.append(t)
    return jnp.concatenate(taps, axis=-1)


def _wino_kernel(xw_hbm, u_ref, b_ref, o_ref, xwin, sem, e_ref, f_ref, *,
                 th: int, wt: int, cp: int, n_i: int, n_win: int):
    g = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.program_id(2)
    k = pl.program_id(3)

    def _copy(win_idx, slot):
        gg = win_idx // n_i
        ii = win_idx - gg * n_i
        return pltpu.make_async_copy(
            xw_hbm.at[gg, pl.ds(ii * 2 * th, 2 * th + 2)],
            xwin.at[slot], sem.at[slot],
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

        # row transform E[k1] = sum_a BT[k1, a] d[a], f32, once per band —
        # written per tile-row with static offsets (no in-kernel concat;
        # value-level concatenate has no guaranteed Mosaic lowering)
        for t in range(th):
            da = [xwin[slot, 2 * t + a].astype(jnp.float32) for a in range(4)]
            sl_t = pl.ds(t * wt, wt)
            e_ref[0, sl_t] = da[0] - da[2]
            e_ref[1, sl_t] = da[1] + da[2]
            e_ref[2, sl_t] = da[2] - da[1]
            e_ref[3, sl_t] = da[1] - da[3]

    k1 = k // 4
    k2 = k - k1 * 4

    @pl.when(k == 0)
    def _init_f():
        f_ref[:] = jnp.zeros_like(f_ref)

    # lane combine V_k = sum_b BT[k2, b] E[k1][:, b*Cp:(b+1)*Cp].  k1/k2 are
    # traced grid scalars but the combine pattern is static per value, so the
    # four k2 cases (each "c0*lane(b0) + c1*lane(b1)", the common form of
    # every B^T row) unroll under pl.when — one executes per grid step.
    def lane(bb):
        return e_ref[k1, :, bb * cp:(bb + 1) * cp]

    for k2s, (c0, b0s, c1, b1s) in enumerate(
        [(1.0, 0, -1.0, 2), (1.0, 1, 1.0, 2), (1.0, 2, -1.0, 1), (1.0, 1, -1.0, 3)]
    ):
        @pl.when(k2 == k2s)
        def _dot(c0=c0, b0s=b0s, c1=c1, b1s=b1s):
            v = (c0 * lane(b0s) + c1 * lane(b1s)).astype(o_ref.dtype)
            m = jax.lax.dot_general(
                v, u_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # accumulate into F[o1] with AT[o1, k1] (0/±1 static per k1,
            # but k1 is traced — unroll the 4 cases)
            for k1s in range(4):
                a0 = _AT[0][k1s]
                a1 = _AT[1][k1s]

                @pl.when(k1 == k1s)
                def _acc(a0=a0, a1=a1):
                    if a0:
                        f_ref[0, k2s] = f_ref[0, k2s] + (a0 * m)
                    if a1:
                        f_ref[1, k2s] = f_ref[1, k2s] + (a1 * m)

    @pl.when(k == 15)
    def _store():
        bias = b_ref[:]  # (1, BN) f32
        for o1 in range(2):
            y0 = f_ref[o1, 0] + f_ref[o1, 1] + f_ref[o1, 2] + bias
            y1 = f_ref[o1, 1] - f_ref[o1, 2] - f_ref[o1, 3] + bias
            o_ref[0, 2 * o1] = y0.astype(o_ref.dtype).reshape(o_ref.shape[2:])
            o_ref[0, 2 * o1 + 1] = y1.astype(o_ref.dtype).reshape(o_ref.shape[2:])


def _plan(h: int, w: int, c: int, cout: int, itemsize: int):
    """(th, bn, cp) or (0,0,0).  M = th * W/2 targets 128-256 rows."""
    budget = 12 * 1024 * 1024
    cp = (c + 127) // 128 * 128
    wt = w // 2
    for th in (256 // max(wt, 1), 128 // max(wt, 1), 64 // max(wt, 1)):
        if th < 1 or (h // 2) % th:
            continue
        m = th * wt
        if m % 8:
            continue
        xwin = 2 * (2 * th + 2) * wt * 4 * cp * itemsize
        e_b = 4 * m * 4 * cp * 4  # f32 E scratch
        for bn in (cout, 1280, 640, 512, 256, 128):
            if bn != cout and bn % 128:
                continue
            if bn > cout or cout % bn:
                continue
            u_b = 2 * cp * bn * itemsize
            f_b = 8 * m * bn * 4
            o_b = 2 * 4 * m * bn * itemsize
            tmp = 2 * m * cp * 4
            if xwin + e_b + u_b + f_b + o_b + tmp <= budget:
                return th, bn, cp
    return 0, 0, 0


_XW_MAX_BYTES = 1792 * 1024 * 1024


def _xw_bytes(b: int, h: int, w: int, c: int, itemsize: int) -> int:
    cp = (c + 127) // 128 * 128
    return b * (h + 2) * (w // 2) * 4 * cp * itemsize


def batch_chunk(b: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of b whose xw slab stays under _XW_MAX_BYTES."""
    per = _xw_bytes(1, h, w, c, itemsize)
    bc = b
    while bc > 1 and (bc * per > _XW_MAX_BYTES or b % bc):
        bc -= 1
    return bc


def route(x: jax.Array, kernel: jax.Array, stride: int, padding) -> bool:
    """Shape/gate check ignoring batch size (the caller batch-chunks)."""
    if os.environ.get("SD_TPU_WINOGRAD", "0") != "1":
        return False
    if x.ndim != 4 or kernel.shape[:2] != (3, 3) or stride != 1:
        return False
    if padding not in ("SAME", 1, ((1, 1), (1, 1))):
        return False
    b, h, w, c = x.shape
    if h % 2 or w % 2 or w < 16:
        return False
    th, bn, cp = _plan(h, w, c, kernel.shape[-1], x.dtype.itemsize)
    return th > 0


def supported(x: jax.Array, kernel: jax.Array, stride: int, padding) -> bool:
    if not route(x, kernel, stride, padding):
        return False
    b, h, w, c = x.shape
    # single-slab form; callers that can lax.map use route() + batch_chunk()
    return _xw_bytes(b, h, w, c, x.dtype.itemsize) <= _XW_MAX_BYTES


def conv3x3_winograd(x: jax.Array, kernel: jax.Array, bias) -> jax.Array:
    """SAME stride-1 3x3 conv via Winograd F(2x2,3x3).  Forward only —
    callers wrap it in the ops/conv.py custom VJPs."""
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    th, bn, cp = _plan(h, w, c, cout, x.dtype.itemsize)
    wt = w // 2
    u = transform_kernel(kernel.astype(x.dtype), cp)
    xw = build_xw(x, cp)
    bias_f = (bias if bias is not None else jnp.zeros((cout,), x.dtype))
    bias_f = bias_f.astype(jnp.float32).reshape(1, cout)

    n_i = (h // 2) // th
    grid = (b, n_i, cout // bn, 16)
    m = th * wt
    kernel_fn = functools.partial(
        _wino_kernel, th=th, wt=wt, cp=cp, n_i=n_i, n_win=b * n_i
    )
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, cp, bn), lambda g, i, n, k: (k, 0, n)),
            pl.BlockSpec((1, bn), lambda g, i, n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, m, bn), lambda g, i, n, k: (g, 0, i, n)
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, (h // 2) * wt, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 2, wt, 4 * cp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((4, m, 4 * cp), jnp.float32),
            pltpu.VMEM((2, 4, m, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 4 * c * cout,  # 16/4 multiplies per output
            bytes_accessed=(b * h * w * c + b * h * w * cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xw, u, bias_f)
    # (B, 4, H/2*W/2, C) -> NHWC interleave: o = o1*2 + o2
    out = out.reshape(b, 2, 2, h // 2, wt, cout)
    out = out.transpose(0, 3, 1, 4, 2, 5)
    return out.reshape(b, h, w, cout)
