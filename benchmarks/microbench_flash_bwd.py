"""Fused flash-attention backward: on-chip parity vs the XLA recompute VJP
and diff-timed bwd A/B at the UNet training shapes (BASELINE config 4).

NOTE the XLA timings are dq-only (the chain feeds back dq, so XLA dead-code
eliminates dk/dv); the kernel computes all three — its measured wins are
conservative.  Run on chip: python benchmarks/microbench_flash_bwd.py
"""

import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from stable_diffusion_tpu.ops import flash_attention as fa

rng = np.random.default_rng(0)

def check(b, s, h, d, label):
    dp = fa._padded_dim(d)
    w = fa.premerged_width(h, d)
    hd = h * dp

    def mk(key):
        x = rng.standard_normal((b, s, hd)).astype(np.float32) * 0.3
        x = np.pad(x, ((0, 0), (0, 0), (0, w - hd)))
        # zero the padded per-head cols like the real premerged projections do
        x3 = x[:, :, :hd].reshape(b, s, h, dp)
        x3[..., d:] = 0.0
        return jnp.asarray(x, jnp.bfloat16)

    q, k, v, g = mk(1), mk(2), mk(3), mk(4)
    scale = d ** -0.5

    def f_kernel(q, k, v):
        return fa._flash_self_premerged(q, k, v, scale, h, dp)

    def f_ref(q, k, v):
        return fa._xla_ref_premerged(q, k, v, scale, h, dp)

    assert fa.bwd_premerged_supported(b, s, w), (b, s, w)
    dks = jax.jit(lambda q, k, v, g: jax.vjp(f_kernel, q, k, v)[1](g))(q, k, v, g)
    drs = jax.jit(lambda q, k, v, g: jax.vjp(f_ref, q, k, v)[1](g))(q, k, v, g)
    for name, a, bb in zip(("dq", "dk", "dv"), dks, drs):
        a = np.asarray(a, np.float32)[:, :, :hd]
        bb = np.asarray(bb, np.float32)[:, :, :hd]
        denom = np.abs(bb).max() + 1e-6
        rel = np.abs(a - bb).max() / denom
        print(f"{label} {name}: max|d|={np.abs(a-bb).max():.4f} rel={rel:.2e}")
        assert rel < 3e-2, (label, name, rel)

def timeit(b, s, h, d, label):
    dp = fa._padded_dim(d)
    w = fa.premerged_width(h, d)
    q = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.bfloat16)
    scale = d ** -0.5

    def bwd_kernel(q, k, v, g):
        _, vjp = jax.vjp(lambda a, bb, c: fa._flash_self_premerged(a, bb, c, scale, h, dp), q, k, v)
        return vjp(g)

    def bwd_xla(q, k, v, g):
        _, vjp = jax.vjp(lambda a, bb, c: fa._xla_ref_premerged(a, bb, c, scale, h, dp), q, k, v)
        return vjp(g)

    for name, fn in (("kernel", bwd_kernel), ("xla   ", bwd_xla)):
        def chain(n):
            @jax.jit
            def f(q, k, v, g):
                def body(c, _):
                    qq, gg = c
                    dq, dk, dv = fn(qq, k, v, gg)
                    return (qq + dq.astype(qq.dtype) * jnp.bfloat16(1e-3), gg), None
                c, _ = jax.lax.scan(body, (q, g), None, length=n)
                return c[0]
            return f
        f1, f2 = chain(4), chain(12)
        np.asarray(f1(q, k, v, g)[:1, :1]); np.asarray(f2(q, k, v, g)[:1, :1])
        ts = []
        for f in (f1, f2):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(q, k, v, g)[:1, :1])
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        dt = (ts[1] - ts[0]) / 8
        print(f"{label} bwd {name}: {dt*1e3:8.3f} ms")

print("backend=", jax.default_backend())
check(2, 512, 8, 40, "s512 h8 d40")
check(1, 4096, 8, 40, "s4096 h8 d40")
check(2, 1024, 8, 80, "s1024 h8 d80")
check(2, 256, 8, 160, "s256 h8 d160")
check(2, 4096, 5, 64, "s4096 h5 d64(sd21)")
timeit(4, 4096, 8, 40, "b4 s4096 w512 ")
timeit(4, 1024, 8, 80, "b4 s1024 w1024")
timeit(4, 256, 8, 160, "b4 s256 w2048 ")
print("OK")
