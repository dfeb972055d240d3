"""Differential microbench of the UNet step's sub-blocks on the real chip.

The axon relay adds ~30 ms of fixed overhead per dispatched program, which
polluted round-1's per-op numbers (a lone conv "costing" 0.9 ms was mostly
relay latency).  Here every measurement is a jitted lax.scan chain of the
block under test, timed at two chain lengths; the difference isolates pure
on-chip time:   t_op = (T(n2) - T(n1)) / (n2 - n1).

Run on chip: python benchmarks/microbench_unet.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import unet as unet_m
from stable_diffusion_tpu.models import layers

N1, N2 = 20, 100


def diff_time(make_chain, *args):
    """make_chain(iters) -> jitted fn(*args).  Returns seconds per iteration."""
    f1, f2 = make_chain(N1), make_chain(N2)
    jax.block_until_ready(f1(*args))  # compile
    jax.block_until_ready(f2(*args))
    ts = []
    for f, n in ((f1, N1), (f2, N2)):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(f(*args))[0][:1, :1])  # force fetch
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (N2 - N1)


def chain(body):
    """body: x -> x (same shape/dtype)."""
    def make(iters):
        @jax.jit
        def run(*args):
            x0 = args[0]
            def step(x, _):
                return body(x, *args[1:]), None
            x, _ = jax.lax.scan(step, x0, None, length=iters)
            return x
        return run
    return make


def main():
    print(f"backend={jax.default_backend()}")
    ucfg = unet_m.UNetConfig.sd15()
    key = jax.random.key(0)
    dt = jnp.bfloat16

    # ---- full UNet CFG step ----
    shapes = jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dt), key)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = jax.device_put(params)
    cond = jax.random.normal(key, (2, 77, 768), dt)
    t = jnp.asarray([500], jnp.int32)

    def unet_body(x, params, cond):
        out = unet_m.unet_apply(params, x, t, cond, ucfg, impl="auto")
        return out.astype(x.dtype) * jnp.bfloat16(0.5) + x * jnp.bfloat16(0.5)

    x = jax.random.normal(key, (2, 64, 64, 4), dt)
    tt = diff_time(chain(unet_body), x, params, cond)
    print(f"full UNet CFG step (b2 64^2): {tt*1e3:8.3f} ms")

    def unet_xla_body(x, params, cond):
        out = unet_m.unet_apply(params, x, t, cond, ucfg, impl="xla")
        return out.astype(x.dtype) * jnp.bfloat16(0.5) + x * jnp.bfloat16(0.5)

    tt = diff_time(chain(unet_xla_body), x, params, cond)
    print(f"full UNet step, impl=xla    : {tt*1e3:8.3f} ms")

    # ---- per-stage resblock ----
    for (res, ch) in ((64, 320), (32, 640), (16, 1280), (8, 1280)):
        pshapes = jax.eval_shape(
            lambda k: unet_m._init_resblock(k, ch, ch, 1280, dt), key
        )
        rp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pshapes)
        temb = jax.random.normal(key, (2, 1280), dt)
        xr = jax.random.normal(key, (2, res, res, ch), dt)

        def rb_body(x, rp, temb):
            return unet_m.resblock_apply(rp, x, temb, eps=1e-5, impl="auto").astype(x.dtype)

        tt = diff_time(chain(rb_body), xr, rp, temb)
        print(f"resblock {res}^2 c{ch}: {tt*1e3:8.3f} ms")

    # ---- per-stage transformer block ----
    for (res, ch, heads) in ((64, 320, 5), (32, 640, 10), (16, 1280, 20)):
        pshapes = jax.eval_shape(
            lambda k: unet_m._init_transformer(k, ch, 768, dt), key
        )
        tp = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pshapes)
        xr = jax.random.normal(key, (2, res, res, ch), dt)

        def tr_body(x, tp, cond):
            return unet_m.transformer_encoder_apply(
                tp, x, cond, num_heads=heads, impl="auto"
            ).astype(x.dtype)

        tt = diff_time(chain(tr_body), xr, tp, cond)
        print(f"transformer {res}^2 c{ch} h{heads}: {tt*1e3:8.3f} ms")

    # ---- conv3x3 alone (XLA) per stage ----
    for (res, ch) in ((64, 320), (32, 640), (16, 1280), (8, 1280)):
        w = jax.random.normal(key, (3, 3, ch, ch), dt) * 0.02
        xr = jax.random.normal(key, (2, res, res, ch), dt)

        def cv_body(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) * jnp.bfloat16(0.5)

        tt = diff_time(chain(cv_body), xr, w)
        fl = 2 * 2 * res * res * ch * ch * 9
        print(f"conv3x3 {res}^2 c{ch}: {tt*1e3:8.3f} ms  {fl/tt/1e12:6.1f} TF/s")

    # ---- GN+SiLU kernel per stage ----
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu
    for (res, ch) in ((64, 320), (32, 640), (16, 1280)):
        gp = {"scale": jnp.ones((ch,), dt), "bias": jnp.zeros((ch,), dt)}
        xr = jax.random.normal(key, (2, res, res, ch), dt)

        def gn_body(x, gp):
            return group_norm_silu(gp, x, eps=1e-5, silu=True, impl="auto").astype(x.dtype)

        tt = diff_time(chain(gn_body), xr, gp)
        def gn_xla_body(x, gp):
            return group_norm_silu(gp, x, eps=1e-5, silu=True, impl="xla").astype(x.dtype)
        tt2 = diff_time(chain(gn_xla_body), xr, gp)
        print(f"gn+silu {res}^2 c{ch}: pallas {tt*1e3:7.3f} ms   xla {tt2*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
