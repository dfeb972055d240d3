"""im2col-dot vs Pallas conv kernel vs XLA spatial conv at every UNet
resblock shape, diff-timed.  If the XLA dot over an explicit im2col view
wins, the hand-built conv kernel should yield to it per shape.

Run on chip: python benchmarks/microbench_im2col.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
    key = jax.random.key(0)
    batch = int(os.environ.get("IM_BATCH", "2"))
    shapes = [
        (batch, 64, 320, 320), (batch, 64, 640, 320), (batch, 64, 960, 320),
        (batch, 32, 640, 640), (batch, 32, 1280, 640), (batch, 32, 1920, 640),
        (batch, 16, 1280, 1280), (batch, 16, 2560, 1280), (batch, 16, 1920, 1280),
        (batch, 96, 320, 320),
    ]
    for (b, s, ci, co) in shapes:
        k1, k2 = jax.random.split(jax.random.fold_in(key, s * ci))
        x = jax.random.normal(k1, (b, s, s, ci), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, ci, co), jnp.bfloat16) * 0.02
        fl = 2 * b * s * s * ci * co * 9

        results = {}
        for name, fn in (("xla", xla_conv), ("im2col", im2col_conv)):
            def make(iters, fn=fn):
                @jax.jit
                def run(x, w):
                    def body(x, _):
                        y = fn(x, w)
                        # feed back a ci-wide mix so no part of y is dead
                        ymix = y * jnp.bfloat16(0.01)
                        if co < ci:
                            reps = ci // co
                            ymix = jnp.concatenate([ymix] * reps, axis=-1)
                        return x * jnp.bfloat16(0.99) + ymix[..., :ci], None
                    x, _ = jax.lax.scan(body, x, None, length=iters)
                    return x
                return run
            results[name] = diff_time(make, x, w)
        if conv_ops.supported(x, w, 1, "SAME"):
            def make(iters):
                @jax.jit
                def run(x, w):
                    def body(x, _):
                        y = conv_ops._conv3x3(x, w, None)
                        ymix = y * jnp.bfloat16(0.01)
                        if co < ci:
                            ymix = jnp.concatenate([ymix] * (ci // co), axis=-1)
                        return x * jnp.bfloat16(0.99) + ymix[..., :ci], None
                    x, _ = jax.lax.scan(body, x, None, length=iters)
                    return x
                return run
            results["pallas"] = diff_time(make, x, w)
        best = min(results, key=results.get)
        print(f"conv b{b} {s}^2 {ci}->{co}: " + "  ".join(
            f"{n} {t*1e6:7.1f}us({fl/t/1e12:5.1f}TF)" for n, t in results.items())
            + f"   -> {best}")


if __name__ == "__main__":
    main()
