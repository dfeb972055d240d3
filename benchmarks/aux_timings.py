"""Auxiliary timings for the two "measure then fix or close" VERDICT items:

1. Text-encode (causal text tower, XLA path) cost per image — is a causal
   flash kernel worth building?  (reference enables flash for its text
   encoders: models/clip/clip.py:23-26)
2. Training forward vs backward split, flash-recompute vs pure-XLA — is a
   fused flash backward worth building?  (the reference's flash_attn wheel
   has a fused CUDA backward)

Run on chip: python benchmarks/aux_timings.py
Results recorded in BASELINE.md round-3 notes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import clip as clip_m
from stable_diffusion_tpu.models import unet as unet_m

N1, N2 = 10, 40


def diff_time(make, *args):
    f1, f2 = make(N1), make(N2)
    np.asarray(jax.tree.leaves(f1(*args))[0])
    np.asarray(jax.tree.leaves(f2(*args))[0])
    ts = []
    for f in (f1, f2):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(f(*args))[0])
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (N2 - N1)


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.key(0)
    dt = jnp.bfloat16

    # ---- 1. text encode (ViT-L, b2 = CFG pair, 77 tokens) ----
    tcfg = clip_m.CLIPTextConfig.vit_l()
    shapes = jax.eval_shape(lambda k: clip_m.init_text_model(k, tcfg, dtype=dt), key)
    tparams = jax.device_put(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    ids = jnp.zeros((2, 77), jnp.int32)

    def make_text(iters):
        @jax.jit
        def run(params, ids):
            def body(c, _):
                out = clip_m.text_model_apply(params, ids, tcfg, impl="auto", dtype=dt)
                return c + jnp.sum(out.astype(jnp.float32)), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return run

    t_text = diff_time(make_text, tparams, ids)
    print(f"text encode ViT-L b2 (causal, XLA path): {t_text*1e3:.3f} ms "
          f"(once per image; vs ~1000 ms/image e2e -> {t_text*1e3/1000*100:.2f}%)")

    # ---- 2. training forward vs backward (flash-recompute vs pure XLA) ----
    ucfg = unet_m.UNetConfig.sd15()
    ushapes = jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dt), key)
    uparams = jax.device_put(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ushapes))
    x = jax.random.normal(key, (4, 64, 64, 4), dt)
    cond = jax.random.normal(key, (4, 77, 768), dt)
    t = jnp.asarray([500], jnp.int32)

    for impl in ("auto", "xla"):
        def make_fwd(iters, impl=impl):
            @jax.jit
            def run(params, x, cond):
                def body(x, _):
                    out = unet_m.unet_apply(params, x, t, cond, ucfg, impl=impl)
                    return out.astype(x.dtype) * jnp.bfloat16(0.5) + x * jnp.bfloat16(0.5), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x
            return run

        t_fwd = diff_time(make_fwd, uparams, x, cond)

        def make_grad(iters, impl=impl):
            def loss(params, x, cond):
                out = unet_m.unet_apply(params, x, t, cond, ucfg, impl=impl, remat=True)
                return jnp.mean(jnp.square(out.astype(jnp.float32)))

            @jax.jit
            def run(params, x, cond):
                def body(x, _):
                    g = jax.grad(loss, argnums=1)(params, x, cond)
                    return x + g.astype(x.dtype) * jnp.bfloat16(0.01), None
                x, _ = jax.lax.scan(body, x, None, length=iters)
                return x
            return run

        t_grad = diff_time(make_grad, uparams, x, cond)
        print(f"impl={impl:5s}: UNet b4 fwd {t_fwd*1e3:7.3f} ms   "
              f"fwd+bwd(remat) {t_grad*1e3:7.3f} ms   bwd share {(t_grad-t_fwd)/t_grad*100:.0f}%")


if __name__ == "__main__":
    main()
