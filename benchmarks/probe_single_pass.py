"""Measured single-pass (resident-KV) attention envelope.

The analytic `_fits_single_pass` VMEM model underestimates Mosaic's real
scoped allocation in a shape-dependent way: s=2304/w=640/bq=256 modeled
15.0 MiB but compiled at 18.95 MiB (VMEM OOM), while s=4096/w=512/bq=128
modeled 15.2 MiB and fits.  Per-head temporary liveness depends on Mosaic's
scheduling heuristics, so — like the conv kernels' measured-envelope gate —
the single-pass route is gated on a table measured here: for every SD
self-attention shape this probes which q-block sizes actually compile and
times the best one against the online kernel and XLA.

Run on chip: python benchmarks/probe_single_pass.py
Paste the resulting table into ops/flash_attention._SINGLE_PASS_BQ.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from stable_diffusion_tpu.ops import flash_attention as fa

LONG, SHORT = 100, 20

# (s, heads, d) for every self-attention site that can reach the merged path:
# SD1.5 512^2 (64^2/32^2/16^2 latent stages), SD2.1 768^2 and 512^2, and the
# VAE mid-block single-head attention.
SHAPES = [
    (4096, 8, 64),    # SD1.5 64^2: 320ch, d40 -> pad 64, w=512 (headline)
    (1024, 8, 128),   # SD1.5 32^2: 640ch, d80 -> pad 128, w=1024
    (256, 8, 256),    # SD1.5 16^2: 1280ch, d160 -> pad 256, w=2048
    (9216, 5, 64),    # SD2.1 96^2: 320ch d64, w=384 (expected: no fit)
    (2304, 10, 64),   # SD2.1 48^2: 640ch d64, w=640
    (576, 20, 64),    # SD2.1 24^2: 1280ch d64, w=1280
    (4096, 5, 64),    # SD2.1 at 512^2: 64^2 stage, w=384
    (1024, 10, 64),   # SD2.1 at 512^2: 32^2 stage, w=640
    (256, 20, 64),    # SD2.1 at 512^2: 16^2 stage, w=1280
    (4096, 1, 512),   # VAE mid-block attention (single head)
]


def time_chain(fn, q, k, v, length):
    def body(c, _):
        o = fn(c, k, v)
        return (o * jnp.bfloat16(0.125) + q * jnp.bfloat16(0.875)).astype(q.dtype), None

    chain = jax.jit(lambda q_: jax.lax.scan(body, q_, None, length=length)[0])
    jax.block_until_ready(chain(q))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(q))
    return time.perf_counter() - t0


def diff_time(fn, q, k, v):
    tl = time_chain(fn, q, k, v, LONG)
    ts = time_chain(fn, q, k, v, SHORT)
    return (tl - ts) / (LONG - SHORT)


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.key(0)
    table = {}
    for (s, heads, d) in SHAPES:
        dp = fa._padded_dim(d) or d
        w = fa.premerged_width(heads, d)
        if w == 0:
            w = heads * dp
        b = 2
        kq, kk, kv = jax.random.split(jax.random.fold_in(key, s * w), 3)
        q = jax.random.normal(kq, (b, s, w), jnp.bfloat16) * 0.2
        k = jax.random.normal(kk, (b, s, w), jnp.bfloat16) * 0.2
        v = jax.random.normal(kv, (b, s, w), jnp.bfloat16) * 0.2
        scale = d ** -0.5
        flops = 2 * 2 * b * s * s * w
        print(f"s={s} h={heads} d={d} (w={w}):")
        best_bq, best_t = 0, None
        for bq in (256, 192, 128, 96, 64):
            if bq > s or s % bq:
                continue
            try:
                dt = diff_time(
                    lambda q_, k_, v_, bq=bq: fa._flash_merged_single(
                        q_, k_, v_, scale=scale, num_heads=heads, head_dim=dp, bq=bq),
                    q, k, v)
            except Exception as e:
                print(f"  single bq{bq:4d}: FAILED ({str(e).splitlines()[0][:60]})")
                continue
            print(f"  single bq{bq:4d}: {dt*1e3:7.3f} ms ({flops/dt/1e12:6.1f} TF/s)")
            if best_t is None or dt < best_t:
                best_bq, best_t = bq, dt
            if best_t is not None and bq <= 128:
                break  # smaller blocks only get slower once one fits
        try:
            ob, ok_ = fa._pick_blocks(s, w, 2)
            if s % ob == 0 and s % ok_ == 0:
                dt = diff_time(
                    lambda q_, k_, v_: fa._flash_merged_online(
                        q_, k_, v_, scale=scale, num_heads=heads, head_dim=dp),
                    q, k, v)
                print(f"  online bq{ob}/bk{ok_}: {dt*1e3:7.3f} ms ({flops/dt/1e12:6.1f} TF/s)")
        except Exception as e:
            print(f"  online: FAILED ({str(e).splitlines()[0][:60]})")
        dt = diff_time(
            lambda q_, k_, v_: fa._xla_ref_premerged(q_, k_, v_, scale, heads, dp),
            q, k, v)
        print(f"  xla: {dt*1e3:7.3f} ms ({flops/dt/1e12:6.1f} TF/s)")
        table[(s, w)] = best_bq
    print("\n_SINGLE_PASS_BQ = {")
    for (s, w), bq in sorted(table.items()):
        print(f"    ({s}, {w}): {bq},")
    print("}")


if __name__ == "__main__":
    main()
