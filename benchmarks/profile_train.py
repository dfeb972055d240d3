"""Per-HLO-op profile of the UNet training fwd+bwd step (b4 512^2, remat),
splitting the backward's time across Pallas kernels / XLA convs / dots /
fusions — locates where the 83%-of-step backward actually goes.

Run on chip: python benchmarks/profile_train.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.op_profile import report
from stable_diffusion_tpu.models import unet as unet_m

ITERS = 10


def main():
    print(f"backend={jax.default_backend()}")
    b = int(os.environ.get("TP_BATCH", "4"))
    res = int(os.environ.get("TP_RES", "64"))
    ucfg = unet_m.UNetConfig.sd15()
    key = jax.random.key(0)
    dt = jnp.bfloat16
    shapes = jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dt), key)
    params = jax.device_put(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    cond = jax.random.normal(key, (b, 77, ucfg.cross_attention_dim), dt)
    t = jnp.asarray([500] * b, jnp.int32)
    x = jax.random.normal(key, (b, res, res, 4), dt)
    target = jax.random.normal(jax.random.key(1), x.shape, dt)

    apply_remat = jax.checkpoint(
        lambda p, xx: unet_m.unet_apply(p, xx, t, cond, ucfg, impl="auto")
    )

    def loss_fn(p, xx):
        out = apply_remat(p, xx)
        return jnp.mean((out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    @jax.jit
    def chain(params, x):
        def body(carry, _):
            p, xx = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, xx)
            # feed grads back into params so nothing is DCE'd
            p2 = jax.tree.map(lambda a, g: a - jnp.asarray(1e-8, a.dtype) * g.astype(a.dtype), p, grads)
            return (p2, xx + jnp.bfloat16(loss.astype(jnp.bfloat16) * 0)), loss

        (p, _), losses = jax.lax.scan(body, (params, x), None, length=ITERS)
        return jax.tree.leaves(p)[0], losses

    out = chain(params, x)
    jax.block_until_ready(out)  # compile + warm
    logdir = "/tmp/train_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(params, x))
    dt_step = (time.perf_counter() - t0) / ITERS
    jax.profiler.stop_trace()
    print(f"train fwd+bwd step b{b} {res}^2 remat: {dt_step*1e3:.3f} ms")
    report(logdir, ITERS)


if __name__ == "__main__":
    main()
