"""Long-sequence attention microbench (SD2.1 768^2 shapes).

The 96^2-latent step profile (BASELINE.md round 3) showed the s=9216
self-attention running at ~33 TF/s on the online-softmax path (bk=1024) and
the s=2304 attention falling back to XLA entirely (2304 % 512 != 0 block
divisibility).  This bench diff-times, per shape:

  * online kernel at the old blocks vs the long-seq retuned blocks
  * the single-pass resident-KV kernel where it fits (s=2304)
  * the XLA reference

Chained-scan differential timing (T(100)-T(20))/80 per BASELINE.md
methodology.  Run on chip: python benchmarks/microbench_attn_long.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.ops import flash_attention as fa

LONG, SHORT = 100, 20


def time_chain(fn, q, k, v, length):
    def body(c, _):
        o = fn(c, k, v)
        return (o * jnp.bfloat16(0.125) + q * jnp.bfloat16(0.875)).astype(q.dtype), None

    chain = jax.jit(lambda q_: jax.lax.scan(body, q_, None, length=length)[0])
    jax.block_until_ready(chain(q))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(q))
    return time.perf_counter() - t0


def bench(name, fn, q, k, v, flops):
    try:
        tl = time_chain(fn, q, k, v, LONG)
        ts = time_chain(fn, q, k, v, SHORT)
    except Exception as e:  # oversized probe blocks can VMEM-OOM at compile
        print(f"  {name:34s} FAILED ({str(e).splitlines()[0][:80]})")
        return None
    dt = (tl - ts) / (LONG - SHORT)
    print(f"  {name:34s} {dt*1e3:7.3f} ms  ({flops/dt/1e12:6.1f} TF/s)")
    return dt


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.key(0)
    for (b, s, heads, d) in ((2, 9216, 5, 64), (2, 2304, 10, 64), (2, 9216, 1, 512)):
        w = fa.premerged_width(heads, d)
        kq, kk, kv = jax.random.split(key, 3)
        q = (jax.random.normal(kq, (b, s, w), jnp.bfloat16) * 0.2)
        k = (jax.random.normal(kk, (b, s, w), jnp.bfloat16) * 0.2)
        v = (jax.random.normal(kv, (b, s, w), jnp.bfloat16) * 0.2)
        scale = d ** -0.5
        # padded FLOPs: QK + PV at the merged padded width
        flops = 2 * 2 * b * s * s * w
        print(f"shape b{b} s{s} h{heads} d{d} (w={w}):")

        def online(bq=None, bk=None):
            return lambda q_, k_, v_: fa._flash_merged_online(
                q_, k_, v_, scale=scale, num_heads=heads, head_dim=fa._padded_dim(d),
                bq=bq, bk=bk)

        bq_new, bk_new = fa._pick_blocks(s, w, 2)
        ref = bench("xla reference", lambda q_, k_, v_: fa._xla_ref_premerged(
            q_, k_, v_, scale, heads, fa._padded_dim(d)), q, k, v, flops)
        if s > 4096:
            bench("online OLD (bq512/bk1024 tier)", online(512 if w <= 1024 else 256, 1024 if w <= 1024 else 512), q, k, v, flops)
        bench(f"online NEW (bq{bq_new}/bk{bk_new})", online(bq_new, bk_new), q, k, v, flops)
        for bk_try in (1152, 2304, 4608):
            if s % bk_try == 0 and bk_try != bk_new:
                bench(f"online (bq{bq_new}/bk{bk_try})", online(bq_new, bk_try), q, k, v, flops)
        # taller q blocks halve the K/V re-streaming (round 4): each q block
        # reads the full K/V once, so DMA ~ (s/bq) * s * w; VMEM admits
        # bq=1024 only with a narrower logits slab (bk <= 1152 at w=384)
        if s > 4096:
            for bq_try, bk_try in ((1024, 1152), (1024, 768), (2304, 768)):
                if s % bq_try == 0 and s % bk_try == 0:
                    try:
                        bench(f"online (bq{bq_try}/bk{bk_try})",
                              online(bq_try, bk_try), q, k, v, flops)
                    except Exception as e:  # scoped-VMEM OOM at compile
                        print(f"  online (bq{bq_try}/bk{bk_try}): {type(e).__name__}")
        sp = fa._single_bq(s, w, 2)
        if sp:
            bench(f"single-pass (bq{sp})", lambda q_, k_, v_: fa._flash_merged_single(
                q_, k_, v_, scale=scale, num_heads=heads,
                head_dim=fa._padded_dim(d), bq=sp), q, k, v, flops)
        # routed (what the dispatcher now picks)
        out_routed = fa._flash_merged(q, k, v, scale=scale, num_heads=heads,
                                      head_dim=fa._padded_dim(d))
        out_ref = fa._xla_ref_premerged(q, k, v, scale, heads, fa._padded_dim(d))
        err = float(jnp.max(jnp.abs(out_routed.astype(jnp.float32)
                                    - out_ref.astype(jnp.float32))))
        print(f"  routed-vs-xla max|d| = {err:.2e}")


if __name__ == "__main__":
    main()
