"""Fused (LN->)matmul(->+residual) kernel vs XLA at the UNet attention
projection shapes, chained-scan timed (methodology: BASELINE.md round-3).

Covers the two fused sites per transformer block:
  * LN -> QKV projection:   (M, C) @ (C, 3*Wp)   [Wp = premerged width]
  * out-proj + residual:    (M, Wp) @ (Wp, C) + res

Run on chip: python benchmarks/microbench_linear.py
"""

import os
import sys
import time

# force the bf16 fused-mm kernels dispatchable regardless of the production
# default (OFF since the round-3 e2e verdict) — this bench exists to
# re-measure them
os.environ.setdefault("SD_TPU_FUSED_MM", "all")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops import linear as fl

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


def bench_ln_qkv(b, s, c, wp):
    key = jax.random.fold_in(jax.random.key(0), s * c)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, s, c), jnp.bfloat16)
    w = jax.random.normal(k2, (c, 3 * wp), jnp.bfloat16) * 0.02
    bb = jnp.zeros((3 * wp,), jnp.float32)
    ln = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    def make(iters, impl):
        @jax.jit
        def run(x, w):
            def body(x, _):
                y = fl.ln_matmul(ln, x, w, bb, impl=impl)
                # feed back through a slice so shapes chain; sum over the
                # out dim mixes all columns (no DCE of the matmul)
                return (x + y[..., :c] * jnp.bfloat16(1e-3)), None
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x
        return run

    flops = 2 * b * s * c * 3 * wp
    mark = "" if fl.supported(b * s, c, 3 * wp) else " (PALLAS=XLA-FALLBACK)"
    t_pal = diff_time(lambda n: make(n, "pallas"), x, w)
    t_xla = diff_time(lambda n: make(n, "xla"), x, w)
    print(
        f"ln_qkv b{b} s{s} c{c} wp{wp}{mark}: pallas {t_pal*1e3:7.3f} ms "
        f"({flops/t_pal/1e12:5.1f} TF/s)  xla {t_xla*1e3:7.3f} ms "
        f"({flops/t_xla/1e12:5.1f} TF/s)  "
        f"{'PALLAS' if t_pal < t_xla else 'xla'} wins"
    )


def bench_out_res(b, s, c, wp):
    key = jax.random.fold_in(jax.random.key(1), s * c)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (b, s, wp), jnp.bfloat16)
    w = jax.random.normal(k2, (wp, c), jnp.bfloat16) * 0.02
    res = jax.random.normal(k3, (b, s, c), jnp.bfloat16)
    bb = jnp.zeros((c,), jnp.float32)

    def make(iters, impl):
        @jax.jit
        def run(x, w, res):
            def body(carry, _):
                x, res = carry
                y = fl.matmul_residual(x, w, bb, res, impl=impl)
                return (x + jnp.pad(y, ((0, 0), (0, 0), (0, wp - c)))
                        * jnp.bfloat16(1e-3), res), None
            (x, res), _ = jax.lax.scan(body, (x, res), None, length=iters)
            return x
        return run

    flops = 2 * b * s * wp * c
    mark = "" if fl.supported(b * s, wp, c) else " (PALLAS=XLA-FALLBACK)"
    t_pal = diff_time(lambda n: make(n, "pallas"), x, w, res)
    t_xla = diff_time(lambda n: make(n, "xla"), x, w, res)
    print(
        f"out_res b{b} s{s} wp{wp} c{c}{mark}: pallas {t_pal*1e3:7.3f} ms "
        f"({flops/t_pal/1e12:5.1f} TF/s)  xla {t_xla*1e3:7.3f} ms "
        f"({flops/t_xla/1e12:5.1f} TF/s)  "
        f"{'PALLAS' if t_pal < t_xla else 'xla'} wins"
    )


def bench_gn_mm(b, hw, c):
    key = jax.random.fold_in(jax.random.key(2), hw * c)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, hw, hw, c), jnp.bfloat16)
    w = jax.random.normal(k2, (c, c), jnp.bfloat16) * 0.02
    bb = jnp.zeros((c,), jnp.float32)
    gn = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    def make(iters, impl):
        @jax.jit
        def run(x, w):
            def body(x, _):
                y = fl.gn_matmul(gn, x, w, bb, eps=1e-6, impl=impl)
                return x + y * jnp.bfloat16(1e-3), None
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x
        return run

    flops = 2 * b * hw * hw * c * c
    mark = "" if fl.gn_supported(b * hw * hw, hw * hw, c, c) else " (PALLAS=XLA-FALLBACK)"
    t_pal = diff_time(lambda n: make(n, "pallas"), x, w)
    t_xla = diff_time(lambda n: make(n, "xla"), x, w)
    print(
        f"gn_mm b{b} {hw}^2 c{c}{mark}: pallas {t_pal*1e3:7.3f} ms "
        f"({flops/t_pal/1e12:5.1f} TF/s)  xla {t_xla*1e3:7.3f} ms "
        f"({flops/t_xla/1e12:5.1f} TF/s)  "
        f"{'PALLAS' if t_pal < t_xla else 'xla'} wins"
    )


def bench_w8a8_qkv(b, s, c, wp):
    key = jax.random.fold_in(jax.random.key(3), s * c)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (b, s, c), jnp.bfloat16)
    wq = jax.random.randint(k2, (c, 3 * wp), -127, 128, jnp.int8)
    ws = jnp.full((1, 3 * wp), 0.01, jnp.float32)
    act = jnp.asarray(4.0, jnp.float32)
    bb = jnp.zeros((3 * wp,), jnp.float32)
    ln = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    def make(iters, impl):
        @jax.jit
        def run(x, wq):
            def body(x, _):
                y = fl.ln_matmul_w8a8(ln, x, wq, ws, act, bb, impl=impl)
                return x + y[..., :c] * jnp.bfloat16(1e-3), None
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x
        return run

    flops = 2 * b * s * c * 3 * wp
    mark = "" if fl.q_supported(b * s, c, 3 * wp) else " (PALLAS=XLA-FALLBACK)"
    t_pal = diff_time(lambda n: make(n, "pallas"), x, wq)
    t_xla = diff_time(lambda n: make(n, "xla"), x, wq)
    print(
        f"w8a8_qkv b{b} s{s} c{c} wp{wp}{mark}: pallas {t_pal*1e3:7.3f} ms "
        f"({flops/t_pal/1e12:5.1f} TF/s)  xla {t_xla*1e3:7.3f} ms "
        f"({flops/t_xla/1e12:5.1f} TF/s)  "
        f"{'PALLAS' if t_pal < t_xla else 'xla'} wins"
    )


def main():
    print(f"backend={jax.default_backend()}")
    # (b, s, C, Wp): SD1.5 stages — 8 heads, d = C/8, dp padded, Wp 128-mult
    stages = [
        (2, 4096, 320, 512),   # 64^2: d40 -> dp64, W=512
        (2, 1024, 640, 640),   # 32^2: d80 -> dp128, W=1024? (check) -- see below
        (2, 256, 1280, 2048),  # 16^2: d160 -> dp256, W=2048
        (2, 64, 1280, 2048),   # bottleneck
        (8, 4096, 320, 512),   # serving b8 (model batch 8)
    ]
    # correct 32^2: 8 heads x dp128 = 1024
    stages[1] = (2, 1024, 640, 1024)
    for (b, s, c, wp) in stages:
        bench_ln_qkv(b, s, c, wp)
        bench_out_res(b, s, c, wp)
    for (b, hw, c) in [(2, 64, 320), (2, 32, 640), (2, 16, 1280)]:
        bench_gn_mm(b, hw, c)
    for (b, s, c, wp) in [(8, 4096, 320, 512), (8, 1024, 640, 1024),
                          (2, 4096, 320, 512)]:
        bench_w8a8_qkv(b, s, c, wp)


if __name__ == "__main__":
    main()
