"""Conv3x3 microbench: XLA conv vs roofline at the SD1.5 UNet's stage shapes.

Measures with CHAINED iterations inside one jitted program (output feeds the
next input), so per-dispatch relay latency and host-side queueing cannot
distort per-op time — the round-1 "fixed-overhead" numbers were measured
call-by-call through the axon relay and are suspect.

Run on chip: python benchmarks/microbench_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

# v5e: ~197 TF/s bf16, ~394 TOP/s int8, ~819 GB/s HBM
PEAK_BF16 = 197e12
PEAK_HBM = 819e9
ITERS = 50


@functools.partial(jax.jit, static_argnums=(2,))
def conv_chain(x, w, iters):
    def body(x, _):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        # keep channel count: feed back only the first Cin channels, scaled
        return y[..., : x.shape[-1]] * jnp.bfloat16(0.999), None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


@functools.partial(jax.jit, static_argnums=(2,))
def matmul_chain(a, b, iters):
    def body(a, _):
        y = jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
        return y[:, : a.shape[1]] * jnp.bfloat16(0.999), None

    a, _ = jax.lax.scan(body, a, None, length=iters)
    return a


def timed(f, *args):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    key = jax.random.key(0)
    shapes = [
        # (B, H, W, Cin, Cout) — SD1.5 512^2 stage shapes at CFG batch 2
        (2, 64, 64, 320, 320),
        (2, 32, 32, 640, 640),
        (2, 16, 16, 1280, 1280),
        (2, 8, 8, 1280, 1280),
        (2, 64, 64, 640, 320),   # decoder concat
        (2, 32, 32, 1280, 640),
        (8, 64, 64, 320, 320),   # throughput mode
        (2, 96, 96, 320, 320),   # 768^2 stage 1
    ]
    for (b, h, w_, ci, co) in shapes:
        if co < ci:
            continue  # chain needs co >= ci
        k1, k2 = jax.random.split(jax.random.fold_in(key, ci * h))
        x = jax.random.normal(k1, (b, h, w_, ci), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, ci, co), jnp.bfloat16) * 0.02
        dt = timed(conv_chain, x, w, ITERS)
        flops = 2 * b * h * w_ * ci * co * 9
        bytes_ = (b * h * w_ * (ci + co) + 9 * ci * co) * 2
        sol = max(flops / PEAK_BF16, bytes_ / PEAK_HBM)
        print(
            f"conv3x3 {b}x{h}x{w_} {ci}->{co}: {dt*1e3:7.3f} ms  "
            f"{flops/dt/1e12:6.1f} TF/s  roofline {sol*1e3:6.3f} ms  "
            f"({dt/sol:5.1f}x off)"
        )

    for (m, k, n) in [(8192, 2880, 320), (8192, 320, 320), (2048, 5760, 640),
                      (8192, 320, 2560), (4096, 1280, 1280)]:
        if n < k:
            continue
        k1, k2 = jax.random.split(jax.random.fold_in(key, m + k + n))
        a = jax.random.normal(k1, (m, k), jnp.bfloat16)
        bm = jax.random.normal(k2, (k, n), jnp.bfloat16) * 0.02
        dt = timed(matmul_chain, a, bm, ITERS)
        flops = 2 * m * k * n
        print(f"matmul {m}x{k}x{n}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
