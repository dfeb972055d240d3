"""Tests for ops/conv.py (Pallas conv3x3 + fused GN-SiLU-conv).

CPU runs exercise the XLA fallback paths and the shape gating; the Pallas
kernel itself is verified on-chip (benchmarks/microbench_conv.py measured
parity < bf16 ulp vs the XLA conv for every UNet stage shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.ops import conv as C
from stable_diffusion_tpu.ops.groupnorm import gn_scale_shift


def _conv_params(key, ci, co, bias=True):
    return layers.init_conv2d(key, ci, co, 3, bias=bias)


def test_conv3x3_fallback_matches_conv2d(rng):
    key = jax.random.key(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    p = _conv_params(key, 32, 64)
    got = C.conv3x3(p, x, impl="auto")  # CPU -> XLA path
    want = layers.conv2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_supported_gating():
    key = jax.random.key(0)
    x = jnp.zeros((2, 64, 64, 320), jnp.bfloat16)
    k = jnp.zeros((3, 3, 320, 320), jnp.bfloat16)
    assert C.supported(x, k, 1, "SAME")
    assert not C.supported(x, k, 2, "SAME")          # stride
    assert not C.supported(x, jnp.zeros((1, 1, 320, 320), jnp.bfloat16), 1, "SAME")
    assert not C.supported(jnp.zeros((2, 64, 63, 320), jnp.bfloat16)[:, :, :63], k, 1, "SAME")  # W % 8
    # outside the envelope: batch >= 8, 8^2 spatial, VAE large-spatial/small-C
    assert not C.supported(jnp.zeros((8, 64, 64, 320), jnp.bfloat16), k, 1, "SAME")
    assert not C.supported(jnp.zeros((2, 8, 8, 1280), jnp.bfloat16),
                           jnp.zeros((3, 3, 1280, 1280), jnp.bfloat16), 1, "SAME")
    # VAE large-spatial envelope: decoder/encoder resblock convs take the
    # kernel at batch <= 2 (decode 79 -> 34 ms/img at b1,
    # microbench_vae_decode.py); XLA's tall-M conv wins at batch >= 4; the
    # tiny-N output head (128->3) stays XLA
    assert C.supported(jnp.zeros((1, 512, 512, 128), jnp.bfloat16),
                       jnp.zeros((3, 3, 128, 128), jnp.bfloat16), 1, "SAME")
    assert C.supported(jnp.zeros((2, 256, 256, 512), jnp.bfloat16),
                       jnp.zeros((3, 3, 512, 512), jnp.bfloat16), 1, "SAME")
    assert not C.supported(jnp.zeros((4, 128, 128, 512), jnp.bfloat16),
                           jnp.zeros((3, 3, 512, 512), jnp.bfloat16), 1, "SAME")
    assert not C.supported(jnp.zeros((1, 512, 512, 128), jnp.bfloat16),
                           jnp.zeros((3, 3, 128, 3), jnp.bfloat16), 1, "SAME")
    assert not C.supported(jnp.zeros((1, 512, 512, 64), jnp.bfloat16),
                           jnp.zeros((3, 3, 64, 128), jnp.bfloat16), 1, "SAME")
    # in the envelope (layout coherence): 16^2..96^2 resblock/upsample convs,
    # incl. big-K skip-concat shapes via K-blocked weights + c3p escalation
    assert C.supported(jnp.zeros((2, 64, 64, 960), jnp.bfloat16),
                       jnp.zeros((3, 3, 960, 320), jnp.bfloat16), 1, "SAME")
    assert C.supported(jnp.zeros((2, 32, 32, 640), jnp.bfloat16),
                       jnp.zeros((3, 3, 640, 640), jnp.bfloat16), 1, "SAME")
    assert C.supported(jnp.zeros((2, 96, 96, 320), jnp.bfloat16), k, 1, "SAME")
    assert C.supported(jnp.zeros((2, 16, 16, 1280), jnp.bfloat16),
                       jnp.zeros((3, 3, 1280, 1280), jnp.bfloat16), 1, "SAME")


def test_gn_scale_shift_matches_group_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    p = {"scale": jnp.asarray(rng.standard_normal(32), jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(32), jnp.float32)}
    ss = gn_scale_shift(p, x, num_groups=8, eps=1e-5)
    got = x * ss[:, 0][:, None, None, :] + ss[:, 1][:, None, None, :]
    want = layers.group_norm(p, x, num_groups=8, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_gn_silu_conv3x3_fallback(rng):
    key = jax.random.key(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    gp = {"scale": jnp.ones((32,), jnp.float32), "bias": jnp.zeros((32,), jnp.float32)}
    cp = _conv_params(key, 32, 64)
    got = C.gn_silu_conv3x3(gp, cp, x, num_groups=8, eps=1e-5, impl="auto")
    want = layers.conv2d(cp, layers.silu(layers.group_norm(gp, x, num_groups=8, eps=1e-5)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_quantized_conv_fallback_matches_dequant(rng):
    """W8A8 conv params route through the dequantized fallback on CPU and
    match an explicit dequantize + gn-silu-conv."""
    from stable_diffusion_tpu.utils.quantize_model import (
        attach_act_scales, quantize_convs)

    key = jax.random.key(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    gp = {"scale": jnp.ones((32,), jnp.float32), "bias": jnp.zeros((32,), jnp.float32)}
    cp = _conv_params(key, 32, 64)
    qp = attach_act_scales(quantize_convs({"c": cp}), convs=True)["c"]
    assert "kernel_q" in qp and "act_scale" in qp and "kernel" not in qp
    got = C.gn_silu_conv3x3(gp, qp, x, num_groups=8, eps=1e-5, impl="auto")
    deq = (qp["kernel_q"].astype(jnp.float32) * qp["kernel_scale"]).reshape(cp["kernel"].shape)
    want = C.gn_silu_conv3x3(gp, {"kernel": deq, "bias": cp["bias"]}, x,
                             num_groups=8, eps=1e-5, impl="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_conv_calibration_capture(rng):
    """calibrate_static_conv_activations records per-conv absmax."""
    from stable_diffusion_tpu.utils.quantize_model import (
        calibrate_static_conv_activations)

    key = jax.random.key(4)
    gp = {"scale": jnp.ones((32,), jnp.float32), "bias": jnp.zeros((32,), jnp.float32)}
    cp = _conv_params(key, 32, 32)
    params = {"gn": gp, "conv": cp}

    def apply_fn(p, x):
        return C.gn_silu_conv3x3(p["gn"], p["conv"], x, num_groups=8, eps=1e-5)

    batches = [jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
               for _ in range(2)]
    out = calibrate_static_conv_activations(apply_fn, params, batches)
    assert "act_scale" in out["conv"] and float(out["conv"]["act_scale"]) > 0


def test_gn_silu_conv3x3_grads(rng):
    """The custom-VJP recompute path differentiates."""
    key = jax.random.key(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    gp = {"scale": jnp.ones((16,), jnp.float32), "bias": jnp.zeros((16,), jnp.float32)}
    cp = _conv_params(key, 16, 16)

    def loss(gp, cp, x):
        return jnp.sum(C.gn_silu_conv3x3(gp, cp, x, num_groups=4, eps=1e-5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(gp, cp, x)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_conv_bwd_flipped_kernel_dx(rng):
    """The split backward (dx via the forward dispatcher with the flipped,
    I/O-swapped kernel; dw/db via the XLA vjp) matches the plain XLA vjp of
    the GN-SiLU-conv composite to f32 precision (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    from stable_diffusion_tpu.ops import conv as C

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 320)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 320, 320)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((320,)), jnp.float32)
    gm = jnp.asarray(rng.standard_normal((320,)), jnp.float32)
    bt = jnp.asarray(rng.standard_normal((320,)), jnp.float32)

    def f_custom(gm, bt, x, k, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(C._gn_silu_conv(gm, bt, x, k, b, 32, 1e-5) ** 2)

    def f_xla(gm, bt, x, k, b):
        return jnp.sum(C._gn_silu_conv_xla(gm, bt, x, k, b, 32, 1e-5) ** 2)

    g1 = jax.grad(f_custom, argnums=(0, 1, 2, 3, 4))(gm, bt, x, k, b)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2, 3, 4))(gm, bt, x, k, b)
    for n, a, bb in zip(("dgamma", "dbeta", "dx", "dw", "db"), g1, g2):
        r = (np.abs(np.asarray(a) - np.asarray(bb)).max()
             / (np.abs(np.asarray(bb)).max() + 1e-9))
        assert r < 2e-5, (n, r)
