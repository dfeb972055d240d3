"""Winograd F(2x2,3x3) conv kernel (ops/winograd.py) parity vs XLA conv."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stable_diffusion_tpu.ops import winograd as wg
from stable_diffusion_tpu.ops import conv as conv_ops


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _xla_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@pytest.mark.parametrize(
    "shape",
    [(1, 16, 16, 128, 128),   # square, aligned C
     (2, 8, 32, 320, 320),    # rect, C 320 -> Cp 384 pad
     (1, 16, 16, 192, 256)],  # Cin != Cout
)
def test_winograd_matches_xla(rng, shape):
    b, h, w, cin, cout = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    th, bn, cp = wg._plan(h, w, cin, cout, 4)
    assert th > 0
    with pltpu.force_tpu_interpret_mode():
        got = wg.conv3x3_winograd(x, k, bias)
    want = _xla_conv(x, k, bias)
    r = (np.abs(np.asarray(got) - np.asarray(want)).max()
         / np.abs(np.asarray(want)).max())
    assert r < 1e-5, r


def test_winograd_gate_and_grads(rng, monkeypatch):
    """Gate is env-opt-in; gradients through the dispatcher still match the
    XLA vjp (the custom VJP recomputes through XLA regardless of the
    forward's winograd/tap choice)."""
    monkeypatch.setenv("SD_TPU_WINOGRAD", "1")
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    assert wg.supported(x, k, 1, "SAME")
    monkeypatch.setenv("SD_TPU_WINOGRAD", "0")
    assert not wg.supported(x, k, 1, "SAME")

    monkeypatch.setenv("SD_TPU_WINOGRAD", "1")

    def f_kernel(x, k, bias):
        return jnp.sum(conv_ops._conv3x3(x, k, bias) ** 2)

    def f_xla(x, k, bias):
        return jnp.sum(_xla_conv(x, k, bias) ** 2)

    # the whole grad runs under interpret: the backward's dx conv routes
    # through the dispatcher too and may itself pick the winograd kernel
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(x, k, bias)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, k, bias)
    for name, a, b2 in zip("x k b".split(), g1, g2):
        r = (np.abs(np.asarray(a) - np.asarray(b2)).max()
             / (np.abs(np.asarray(b2)).max() + 1e-9))
        assert r < 2e-5, (name, r)


def test_winograd_bf16_error_comparable_to_direct(rng):
    """bf16 Winograd's deviation from f32 ground truth must stay within ~2x
    of the direct bf16 conv's own rounding error (the transforms are exact
    in f32; only the V/U bf16 rounding before the MXU adds noise)."""
    b, h, w, cin, cout = 1, 16, 16, 128, 128
    x32 = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    truth = np.asarray(_xla_conv(x32, k32, bias))
    direct = np.asarray(_xla_conv(
        x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
        bias.astype(jnp.bfloat16)), np.float32)
    with pltpu.force_tpu_interpret_mode():
        wino = np.asarray(wg.conv3x3_winograd(
            x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
            bias.astype(jnp.bfloat16)), np.float32)

    scale = np.abs(truth).max()
    e_direct = np.abs(direct - truth).max() / scale
    e_wino = np.abs(wino - truth).max() / scale
    assert e_wino < 2.5 * max(e_direct, 1e-4), (e_wino, e_direct)
