"""Measure host-fetch cost of the same 25 MB of uint8 image data in
different on-device shapes.

TPU tiles the last two dims ((32, 128) for u8); a trailing dim of 3 is
lane-padded 3->128, so fetching NHWC u8 may repack or transfer padding.
Candidates: (b,h,w,3) vs lane-aligned (b,h,w*3) vs flat (n,128) vs f32.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 32, 512, 512
REPS = 3


def timed_fetch(make):
    # fresh value each rep so no cache; time np.asarray only
    xs = [make(i) for i in range(REPS)]
    for x in xs:
        x.block_until_ready()
    t0 = time.perf_counter()
    for x in xs:
        np.asarray(x)
    return (time.perf_counter() - t0) / REPS


def main():
    key = jax.random.key(0)

    @jax.jit
    def gen(i):
        x = jax.random.uniform(jax.random.fold_in(key, i), (B, H, W, 3))
        u = jnp.round(x * 255).astype(jnp.uint8)
        return u, u.reshape(B, H, W * 3), u.reshape(B * H * W * 3 // 128, 128), x

    shapes = {}
    a, b, c, d = gen(0)  # compile
    for name, val in [("u8 nhwc (..,3)", a), ("u8 (b,h,w*3)", b),
                      ("u8 flat (n,128)", c), ("f32 nhwc", d)]:
        shapes[name] = val

    for name in shapes:
        def make(i, _n=name):
            outs = gen(i + 1)
            return outs[["u8 nhwc (..,3)", "u8 (b,h,w*3)",
                         "u8 flat (n,128)", "f32 nhwc"].index(_n)]
        dt = timed_fetch(make)
        nbytes = shapes[name].size * shapes[name].dtype.itemsize
        print(f"{name:18s}: {dt*1e3:8.1f} ms  ({nbytes/dt/1e6:7.1f} MB/s logical)")


if __name__ == "__main__":
    main()
