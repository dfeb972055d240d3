"""Per-HLO-op profile of the UNet CFG denoise step (or any bench config).

Captures a jax.profiler trace of a chained-scan UNet step on the chip and
prints the hlo_stats table (self-time per HLO op), aggregated by category —
the tool that locates the "glue" milliseconds (relayouts, copies, converts,
norm stats) between the Pallas kernels and the XLA matmuls.

Run on chip:
    python benchmarks/op_profile.py              # UNet CFG step, b2 64^2
    OP_BATCH=8 python benchmarks/op_profile.py   # serving batch
    OP_RES=96 python benchmarks/op_profile.py    # 768^2 stages
    OP_INT8=full python benchmarks/op_profile.py # W8A8 path
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_tpu.models import unet as unet_m

ITERS = 30


def main():
    print(f"backend={jax.default_backend()}")
    b = int(os.environ.get("OP_BATCH", "2"))
    res = int(os.environ.get("OP_RES", "64"))
    int8 = os.environ.get("OP_INT8", "")
    sd = os.environ.get("OP_SD", "1.5")
    ucfg = unet_m.UNetConfig.sd15() if sd == "1.5" else unet_m.UNetConfig.sd21()
    key = jax.random.key(0)
    dt = jnp.bfloat16
    shapes = jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dt), key)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    if int8:
        from stable_diffusion_tpu.utils.quantize_model import (
            attach_act_scales, quantize_convs, quantize_params)
        params = quantize_params(params)
        if int8 == "full":
            params = quantize_convs(params)
            params = attach_act_scales(params, convs=True)
        else:
            params = attach_act_scales(params)
    params = jax.device_put(params)
    cdim = ucfg.cross_attention_dim
    cond = jax.random.normal(key, (b, 77, cdim), dt)
    t = jnp.asarray([500], jnp.int32)
    x = jax.random.normal(key, (b, res, res, 4), dt)

    @jax.jit
    def chain(x, params, cond):
        def body(x, _):
            out = unet_m.unet_apply(params, x, t, cond, ucfg, impl="auto")
            return out.astype(x.dtype) * jnp.bfloat16(0.5) + x * jnp.bfloat16(0.5), None
        x, _ = jax.lax.scan(body, x, None, length=ITERS)
        return x

    jax.block_until_ready(chain(x, params, cond))  # compile
    logdir = os.environ.get("OP_LOGDIR", "/tmp/op_profile")
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(x, params, cond))
    dt_step = (time.perf_counter() - t0) / ITERS
    jax.profiler.stop_trace()
    print(f"UNet step b{b} {res}^2 {'int8-'+int8 if int8 else 'bf16'}: {dt_step*1e3:.3f} ms")

    report(logdir, ITERS)


def _category(name: str) -> str:
    n = name.lower()
    for key, cat in (
        ("custom-call", "pallas-custom-call"), ("conv", "convolution"),
        ("dot", "dot"), ("copy", "copy"), ("transpose", "transpose"),
        ("convert", "convert"), ("reduce", "reduce"), ("scatter", "scatter"),
        ("gather", "gather"), ("dynamic", "dynamic-slice/update"),
        ("concatenate", "concatenate"), ("pad", "pad"), ("slice", "slice"),
        ("rng", "rng"), ("all-reduce", "collective"), ("bitcast", "bitcast"),
        ("broadcast", "broadcast"), ("iota", "iota"), ("select", "select"),
        ("compare", "compare"), ("exp", "elementwise"), ("add", "elementwise"),
        ("mul", "elementwise"), ("sub", "elementwise"), ("div", "elementwise"),
        ("tanh", "elementwise"), ("log", "elementwise"),
    ):
        if key in n:
            return cat
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(other)"
    return "other"


def report(logdir, iters):
    """Aggregate TPU-plane op events from the raw xplane (the tbp converter's
    native wrapper is broken against this TF build)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert xplanes, f"no xplane under {logdir}"
    space = xplane_pb2.XSpace()
    with open(xplanes[0], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        per_line = {}
        for line in plane.lines:
            tot = sum(e.duration_ps for e in line.events)
            per_line[line.name] = (tot, line)
        print(f"\n== plane {plane.name} ==")
        # the op-level line is the busiest non-module line
        for lname, (tot, line) in sorted(per_line.items(), key=lambda kv: -kv[1][0]):
            print(f"line '{lname}': {tot/1e12*1e3/iters:8.3f} ms/step over {len(line.events)} events")
        # Prefer the synchronous 'XLA Ops' line: the 'Async XLA Ops' line is
        # overlapped DMA (copy-start/slice-start prefetches that hide behind
        # compute), so aggregating it misattributes the step to "copy".
        opline = per_line.get("XLA Ops", (None, None))[1]
        if opline is None:
            for lname, (tot, line) in sorted(per_line.items(), key=lambda kv: -kv[1][0]):
                if ("module" not in lname.lower() and "step" not in lname.lower()
                        and "async" not in lname.lower()):
                    opline = line
                    break
        if opline is None:
            continue
        agg, total = {}, 0.0
        for e in opline.events:
            name = meta.get(e.metadata_id, "?")
            # control-flow wrappers (while/conditional/call) report the TOTAL
            # time of their body, which is also reported per-op — skip them
            # or every bucket percentage is diluted ~2x by the denoise scan
            if name.lstrip("%").startswith(("while", "conditional", "call")):
                continue
            d = e.duration_ps / 1e12  # seconds
            cat = _category(name)
            a = agg.setdefault(cat, [0.0, {}])
            a[0] += d
            a[1][name] = a[1].get(name, 0.0) + d
            total += d
        print(f"\n== self-time by category (line '{opline.name}', "
              f"{total*1e3/iters:.3f} ms/step) ==")
        for cat, (st, items) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
            print(f"{cat:24s} {st*1e3/iters:7.3f} ms/step  ({st/total*100:4.1f}%)")
            for n, s_ in sorted(items.items(), key=lambda kv: -kv[1])[:4]:
                print(f"      {s_*1e3/iters:7.4f} ms  {n[:100]}")


if __name__ == "__main__":
    main()
