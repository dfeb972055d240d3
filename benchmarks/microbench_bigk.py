"""A/B the big-K concat-input convs: XLA im2col dot (current route, which
materializes a 9x HBM im2col build — the dominant glue-bytes sites in
benchmarks/flop_floor.py) vs the Pallas tap kernel (3x width-im2col build,
K-block weight streaming).

The use_im2col_conv gate (models/layers.py) routes 2*cin >= 3*cout shapes to
the XLA dot only while the im2col buffer stays under its 80 MB cap — the two
64^2 shapes below exceed it and conv2d falls through to XLA's spatial conv
(and production routes them to the Pallas kernel anyway); each row's first
column is labeled with the route conv2d actually takes.  This measures
whether the gate's choice holds once the im2col build's HBM traffic is
charged in-program (chained-scan differential, value fetched).

    python benchmarks/microbench_bigk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.ops import conv as C

# the UNet up-path concat-input convs that use_im2col_conv currently routes
# to the XLA dot (flop_floor.py glue table, b2 CFG step)
SHAPES = [
    # (b, s, cin, cout)
    (2, 32, 1920, 1280),
    (2, 32, 1280, 640),
    (2, 16, 2560, 1280),
    (2, 16, 1920, 1280),
    (2, 64, 960, 320),
    (2, 64, 640, 320),
]


def timed(make, iters_hi=60, iters_lo=12):
    f_hi, f_lo = make(iters_hi), make(iters_lo)
    for f in (f_hi, f_lo):
        jax.block_until_ready(f())  # compile
    t0 = time.perf_counter(); jax.block_until_ready(f_hi()); t_hi = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(f_lo()); t_lo = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters_hi - iters_lo)


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.key(0)
    for (b, s, ci, co) in SHAPES:
        k1, k2 = jax.random.split(jax.random.fold_in(key, s * ci + co))
        x = jax.random.normal(k1, (b, s, s, ci), jnp.bfloat16)
        w = jax.random.normal(k2, (3, 3, ci, co), jnp.bfloat16) * 0.02
        fl = 2 * b * s * s * ci * co * 9
        ok = C.supported(x, w, 1, "SAME") or C._plan(s, s, ci, co, 2)[1] > 0

        def route_im2col(x, w):
            return layers.conv2d({"kernel": w}, x)

        def route_kernel(x, w):
            return C._conv3x3(x, w, None)

        # label the conv2d column by the route it ACTUALLY takes: the
        # use_im2col_conv gate rejects 64^2 big-K shapes (im2col buffer
        # exceeds the 80 MB cap) and conv2d falls through to XLA's spatial
        # conv there, so calling the column "im2col" would mislead.
        takes_im2col = layers.use_im2col_conv(x.shape, w.shape)
        prod_name = "im2col" if takes_im2col else "xla-spatial"
        row = f"b{b} {s}^2 {ci}->{co}  ({fl/1e9:.1f} GF)"
        for name, fn in ((prod_name, route_im2col),
                         ("pallas", route_kernel if ok else None)):
            if fn is None:
                row += f"  {name}: no plan"
                continue

            def make(iters, fn=fn):
                @jax.jit
                def run(x, w):
                    def body(x, _):
                        y = fn(x, w) * jnp.bfloat16(0.01)
                        if co < ci:
                            y = jnp.concatenate([y] * (-(-ci // co)), axis=-1)
                        return y[..., :ci], None
                    out, _ = jax.lax.scan(body, x, None, length=iters)
                    return out.sum()
                return lambda: run(x, w)

            dt = timed(make)
            row += f"  {name}: {dt*1e3:.3f} ms {fl/dt/1e12:.1f} TF/s"
        print(row)


if __name__ == "__main__":
    main()
