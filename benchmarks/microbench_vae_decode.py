"""Full VAE decode() A/B: current impl=auto (XLA large-spatial convs) vs the
Pallas conv kernel widened to the decoder's shapes.

The decode profile (BASELINE.md round 3) shows in-program XLA convs at
27-37 TF/s in T(2,128) layouts while the SAME shapes standalone hit
89-227 TF/s — the layout-churn failure mode the conv kernel already fixed
for the UNet step.  This measures whole-decoder wall time per variant,
diff-timed (two chain lengths, forced fetch).

Run on chip: python benchmarks/microbench_vae_decode.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import vae as vae_m
from stable_diffusion_tpu.ops import conv as conv_ops

N1, N2 = 6, 18


def build_params():
    vcfg = vae_m.VAEConfig()
    key = jax.random.key(0)
    shapes = jax.eval_shape(lambda k: vae_m.init_vae(k, vcfg, dtype=jnp.bfloat16), key)
    params = jax.device_put(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    return params, vcfg


def chain_fn(params, vcfg, n):
    @jax.jit
    def chain(params, lat):
        def body(l, _):
            img = vae_m.decode(params, l, vcfg, impl="auto")
            l2 = img[:, ::8, ::8, :3]
            return (
                jnp.concatenate([l2, l[..., 3:4]], axis=-1) * jnp.bfloat16(0.5)
                + l * jnp.bfloat16(0.5),
                None,
            )

        l, _ = jax.lax.scan(body, lat, None, length=n)
        return l

    return chain


def time_variant(name, params, vcfg, lat):
    f1 = chain_fn(params, vcfg, N1)
    f2 = chain_fn(params, vcfg, N2)
    np.asarray(f1(params, lat)[:1, :1, :1])
    np.asarray(f2(params, lat)[:1, :1, :1])
    ts = []
    for f in (f1, f2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, lat)[:1, :1, :1])
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (N2 - N1)
    print(f"{name:44s} {dt*1e3:8.2f} ms/decode")
    return dt


def main():
    print("backend=", jax.default_backend())
    params, vcfg = build_params()
    lat = jax.random.normal(jax.random.key(1), (1, 64, 64, 4), jnp.bfloat16)

    # 1. current gate (XLA at 256^2/512^2, kernel at mid 64^2)
    time_variant("auto (current gate)", params, vcfg, lat)

    # 2. widened kernel: all resblock convs with C>=128 up to 512^2
    saved = (conv_ops.MAX_AREA, conv_ops.MIN_CHANNELS)
    try:
        conv_ops.MAX_AREA = 512 * 512
        conv_ops.MIN_CHANNELS = 128
        time_variant("pallas wide (C>=128, area<=512^2)", params, vcfg, lat)

        # 3. kernel up to 256^2 only (512^2 stage stays XLA)
        conv_ops.MAX_AREA = 256 * 256
        conv_ops.MIN_CHANNELS = 128
        time_variant("pallas mid (C>=128, area<=256^2)", params, vcfg, lat)

        # 4. kernel up to 128^2 only
        conv_ops.MAX_AREA = 128 * 128
        conv_ops.MIN_CHANNELS = 128
        time_variant("pallas small (C>=128, area<=128^2)", params, vcfg, lat)
    finally:
        conv_ops.MAX_AREA, conv_ops.MIN_CHANNELS = saved


if __name__ == "__main__":
    main()
