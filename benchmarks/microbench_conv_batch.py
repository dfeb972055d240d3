"""Pallas conv kernel vs XLA at SERVING batches (>= 8), chained-scan timed.

Round 2 gated the kernel OFF at model batch > 4 on an in-program
measurement; this isolates the standalone question: does the im2col tap-
matmul kernel win at b8/b16/b32 stage shapes once re-examined?  Informs the
MAX_KERNEL_BATCH gate (ops/conv.py).

Run on chip: python benchmarks/microbench_conv_batch.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops import conv as conv_ops

ITERS = 30


def timed(f, *args):
    # axon: block_until_ready does not block -> force a value fetch
    np.asarray(jax.tree.leaves(f(*args))[0][:1, :1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(f(*args))[0][:1, :1])
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    print(f"backend={jax.default_backend()}")
    conv_ops.MAX_KERNEL_BATCH = 1024  # open the gate for the A/B
    key = jax.random.key(0)
    shapes = [
        # (B, H, W, C) — one-step b32 runs batch 32 (no CFG); b4 txt2img CFG
        # runs model batch 8; img2img b4 CFG -> 8
        (8, 64, 64, 320), (8, 32, 32, 640), (8, 16, 16, 1280),
        (16, 64, 64, 320),
        (32, 64, 64, 320), (32, 32, 32, 640), (32, 16, 16, 1280),
    ]
    for (b, h, w_, c) in shapes:
        k1, k2 = jax.random.split(jax.random.fold_in(key, b * c + h))
        x = jax.random.normal(k1, (b, h, w_, c), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, c, c), jnp.bfloat16) * 0.02
        params = {"kernel": w}

        @functools.partial(jax.jit, static_argnums=(2,))
        def chain(x, w, impl):
            def body(x, _):
                y = conv_ops.conv3x3({"kernel": w}, x, impl=impl)
                return y * jnp.bfloat16(0.999), None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x

        ok = conv_ops.supported(x, w, 1, "SAME")
        if not ok:
            print(f"conv3x3 b{b} {h}x{w_} c{c}: no feasible block plan")
            continue
        t_pal = timed(chain, x, w, "pallas")
        t_xla = timed(chain, x, w, "xla")
        fl = 2 * b * h * w_ * c * c * 9
        print(
            f"conv3x3 b{b} {h}x{w_} c{c}: pallas {t_pal*1e3:7.3f} ms "
            f"({fl/t_pal/1e12:5.1f} TF/s)  xla {t_xla*1e3:7.3f} ms "
            f"({fl/t_xla/1e12:5.1f} TF/s)  {'PALLAS' if t_pal < t_xla else 'xla'} wins"
        )


def main_int8():
    """W8A8 serving-batch A/B: the int8 Pallas conv (half the im2col DMA
    bytes, double MXU rate) vs the XLA bf16 conv of the dequantized kernel —
    which is exactly what the quant path falls back to when
    quant_supported() rejects the batch.  Round 2's b>=8 negative result was
    bf16-only; int8 changes the bandwidth side of that trade."""
    key = jax.random.key(1)
    shapes = [
        (8, 64, 64, 320), (8, 32, 32, 640), (8, 16, 16, 1280),
        (16, 64, 64, 320),
        (32, 64, 64, 320), (32, 32, 32, 640), (32, 16, 16, 1280),
    ]
    for (b, h, w_, c) in shapes:
        k1, k2 = jax.random.split(jax.random.fold_in(key, b * c + h))
        xn = jax.random.normal(k1, (b, h, w_, c), jnp.bfloat16)
        wf = jax.random.normal(k2, (3, 3, c, c), jnp.float32) * 0.02
        ws = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0
        wq = jnp.round(wf / ws).astype(jnp.int8)
        act = jnp.float32(4.0)
        bias = jnp.zeros((c,), jnp.float32)

        @jax.jit
        def chain_q(x, wq, ws, act, bias):
            def body(x, _):
                y = conv_ops._conv3x3_q(x, wq, ws.reshape(-1), act, bias)
                return y * jnp.bfloat16(0.999), None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x

        @jax.jit
        def chain_deq(x, wq, ws, bias):
            wd = (wq.astype(jnp.float32) * ws).astype(jnp.bfloat16)
            def body(x, _):
                y = jax.lax.conv_general_dilated(
                    x, wd, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return (y + bias.astype(y.dtype)) * jnp.bfloat16(0.999), None
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x

        if w_ % 32 or conv_ops._plan(h, w_, c, c, 1) == (0, 0, 0, 0):
            print(f"conv3x3-q b{b} {h}x{w_} c{c}: outside int8 tiling "
                  "(W % 32) or no feasible plan")
            continue
        t_q = timed(chain_q, xn, wq, ws, act, bias)
        t_x = timed(chain_deq, xn, wq, ws, bias)
        fl = 2 * b * h * w_ * c * c * 9
        print(
            f"conv3x3-q b{b} {h}x{w_} c{c}: int8-pallas {t_q*1e3:7.3f} ms "
            f"({fl/t_q/1e12:5.1f} TF/s)  xla-bf16 {t_x*1e3:7.3f} ms "
            f"({fl/t_x/1e12:5.1f} TF/s)  {'INT8' if t_q < t_x else 'xla'} wins"
        )


if __name__ == "__main__":
    main()
    main_int8()
