"""Fused GeGLU-FFN kernel vs XLA at the SD stage shapes, chained-scan timed.

Run on chip: python benchmarks/microbench_ffn.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops import ffn as ffn_ops

N1, N2 = 20, 100


def diff_time(make, *args):
    """Two-length chained-scan differential: subtracts the ~26 ms relay
    dispatch+fetch overhead that a single-length chain bakes into t/iter."""
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
    # (B, S, C): CFG batch 2 at 512^2 stages; b8 serving; 768^2 stage 1
    shapes = [
        (2, 4096, 320), (2, 1024, 640), (2, 256, 1280), (2, 64, 1280),
        (8, 4096, 320), (8, 1024, 640),
        (2, 9216, 320),
    ]
    for (b, s, c) in shapes:
        hidden = 4 * c
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, b * c + s), 3)
        x = jax.random.normal(k1, (b, s, c), jnp.bfloat16)
        p = {
            "0": {"proj": {
                "kernel": jax.random.normal(k2, (c, 2 * hidden), jnp.bfloat16) * 0.02,
                "bias": jnp.zeros((2 * hidden,), jnp.bfloat16),
            }},
            "1": {
                "kernel": jax.random.normal(k3, (hidden, c), jnp.bfloat16) * 0.02,
                "bias": jnp.zeros((c,), jnp.bfloat16),
            },
        }

        ln = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

        def make(iters, impl):
            @jax.jit
            def run(x, p):
                def body(x, _):
                    y = ffn_ops.geglu_ffn(p, x, ln_params=ln, residual=x, impl=impl)
                    return y * jnp.bfloat16(0.5), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x
            return run

        if not ffn_ops.supported(x, p["0"]["proj"]["kernel"]):
            print(f"ffn b{b} s{s} c{c}: unsupported")
            continue
        t_pal = diff_time(lambda n: make(n, "pallas"), x, p)
        t_xla = diff_time(lambda n: make(n, "xla"), x, p)
        fl = 2 * b * s * c * 3 * hidden
        print(
            f"ffn b{b} s{s} c{c}: pallas {t_pal*1e3:7.3f} ms ({fl/t_pal/1e12:5.1f} TF/s)  "
            f"xla {t_xla*1e3:7.3f} ms ({fl/t_xla/1e12:5.1f} TF/s)  "
            f"{'PALLAS' if t_pal < t_xla else 'xla'} wins"
        )


if __name__ == "__main__":
    main()
