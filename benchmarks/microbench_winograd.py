"""Winograd F(2x2,3x3) vs tap-matmul kernel vs XLA conv at the UNet resblock
shapes, chained-scan timed (methodology: BASELINE.md round-3).

Run on chip: python benchmarks/microbench_winograd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SD_TPU_WINOGRAD", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops import winograd as wg
from stable_diffusion_tpu.ops import conv as conv_ops

N1, N2 = 20, 100


def diff_time(make, *args):
    f1, f2 = make(N1), make(N2)
    np.asarray(jax.tree.leaves(f1(*args))[0][:1, :1])
    np.asarray(jax.tree.leaves(f2(*args))[0][:1, :1])
    ts = []
    for f in (f1, f2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(f(*args))[0][:1, :1])
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (N2 - N1)


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.key(0)
    # (b, h, w, cin, cout): SD1.5 512^2 resblock shapes + VAE decode stages
    shapes = [
        (2, 64, 64, 320, 320),
        (2, 64, 64, 640, 320),   # decoder concat conv
        (2, 32, 32, 640, 640),
        (2, 32, 32, 1280, 640),
        (2, 16, 16, 1280, 1280),
        (2, 96, 96, 320, 320),   # 768^2 stage 0
        (1, 512, 512, 128, 128), # VAE decode last stage
        (1, 256, 256, 256, 256),
        (8, 512, 512, 128, 128), # serving decode chunk (one-step b32 -> bc=8)
        (8, 256, 256, 256, 256),
    ]
    for (b, h, w, cin, cout) in shapes:
        k1, k2 = jax.random.split(jax.random.fold_in(key, h * cin + cout))
        x = jax.random.normal(k1, (b, h, w, cin), jnp.bfloat16)
        k = jax.random.normal(k2, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        bias = jnp.zeros((cout,), jnp.bfloat16)
        th, bn, cp = wg._plan(h, w, cin, cout, 2)
        if th == 0:
            print(f"wino b{b} {h}x{w} {cin}->{cout}: no plan")
            continue

        def make_wino(iters):
            @jax.jit
            def run(x, k):
                def body(x, _):
                    y = wg.conv3x3_winograd(x, k, bias)
                    return (x + y[..., :cin] * jnp.bfloat16(1e-3)
                            if cout >= cin else x), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x
            return run

        def make_tap(iters):
            @jax.jit
            def run(x, k):
                def body(x, _):
                    y = conv_ops._conv3x3_impl(x, k, bias)
                    return (x + y[..., :cin] * jnp.bfloat16(1e-3)
                            if cout >= cin else x), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x
            return run

        def make_xla(iters):
            @jax.jit
            def run(x, k):
                def body(x, _):
                    y = jax.lax.conv_general_dilated(
                        x, k, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
                    return (x + y[..., :cin] * jnp.bfloat16(1e-3)
                            if cout >= cin else x), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x
            return run

        fl = 2 * b * h * w * 9 * cin * cout  # direct-conv FLOPs (for rate)
        t_w = diff_time(make_wino, x, k)
        t_t = diff_time(make_tap, x, k)
        t_x = diff_time(make_xla, x, k)
        best = min(t_w, t_t, t_x)
        who = {t_w: "WINO", t_t: "tap", t_x: "xla"}[best]
        print(
            f"wino b{b} {h}x{w} {cin}->{cout} (th{th} bn{bn}): "
            f"wino {t_w*1e3:7.3f} ms ({fl/t_w/1e12:5.1f} eq-TF/s)  "
            f"tap {t_t*1e3:7.3f} ({fl/t_t/1e12:5.1f})  "
            f"xla {t_x*1e3:7.3f} ({fl/t_x/1e12:5.1f})  -> {who}"
        )


if __name__ == "__main__":
    main()
