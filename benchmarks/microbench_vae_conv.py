"""Pallas conv kernel vs XLA conv vs im2col dot at the VAE decoder's
large-spatial shapes, diff-timed.  The VAE decode profile shows XLA runs
these at 27-37 TF/s (T(2,128) spatial layouts) — ~45 ms of a 77 ms decode.

Run on chip: python benchmarks/microbench_vae_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops import conv as conv_ops

N1, N2 = 10, 40


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


def im2col_conv(x, w):
    b, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + ww, :] for dy in range(3) for dx in range(3)]
    x9 = jnp.concatenate(cols, axis=-1).reshape(b * h * ww, 9 * c)
    return jnp.dot(x9, w.reshape(9 * c, co),
                   preferred_element_type=x.dtype).reshape(b, h, ww, co)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print(f"backend={jax.default_backend()}")
    # open the gate so the Pallas kernel compiles for these shapes
    conv_ops.MAX_AREA = 1 << 30
    conv_ops.MIN_CHANNELS = 0
    key = jax.random.key(0)
    shapes = [
        (1, 64, 512, 512), (1, 128, 512, 512), (1, 256, 512, 512),
        (1, 256, 512, 256), (1, 512, 256, 256), (1, 512, 256, 128),
        (1, 512, 128, 128), (1, 512, 128, 3),
    ]
    for (b, s, ci, co) in shapes:
        k1, k2 = jax.random.split(jax.random.fold_in(key, s * ci + co))
        x = jax.random.normal(k1, (b, s, s, ci), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, ci, co), jnp.bfloat16) * 0.02
        fl = 2 * b * s * s * ci * co * 9

        def feedback(y, x):
            ymix = y * jnp.bfloat16(0.01)
            if co < ci:
                reps = -(-ci // co)
                ymix = jnp.concatenate([ymix] * reps, axis=-1)[..., :ci]
            return x * jnp.bfloat16(0.99) + ymix[..., :ci]

        results = {}
        impls = [("xla", xla_conv), ("im2col", im2col_conv)]
        if conv_ops.supported(x, w, 1, "SAME"):
            impls.append(("pallas", lambda x, w: conv_ops._conv3x3(x, w, None)))
        for name, fn in impls:
            def make(iters, fn=fn):
                @jax.jit
                def run(x, w):
                    def body(x, _):
                        return feedback(fn(x, w), x), None
                    x, _ = jax.lax.scan(body, x, None, length=iters)
                    return x
                return run
            try:
                results[name] = diff_time(make, x, w)
            except Exception as e:
                print(f"  {name} failed: {str(e)[:90]}")
        best = min(results, key=results.get)
        print(f"conv b{b} {s}^2 {ci}->{co}: " + "  ".join(
            f"{n} {t*1e3:7.3f}ms({fl/t/1e12:5.1f}TF)" for n, t in results.items())
            + f"   -> {best}")


if __name__ == "__main__":
    main()
