"""Fused GeGLU-FFN kernel correctness (ops/ffn.py) vs the layer path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.ops import ffn as ffn_ops


def _params(rng, c, hidden):
    k = jax.random.split(jax.random.key(1), 4)
    return {
        "0": {"proj": {
            "kernel": jax.random.normal(k[0], (c, 2 * hidden), jnp.float32) * 0.05,
            "bias": jax.random.normal(k[1], (2 * hidden,), jnp.float32) * 0.1,
        }},
        "1": {
            "kernel": jax.random.normal(k[2], (hidden, c), jnp.float32) * 0.05,
            "bias": jax.random.normal(k[3], (c,), jnp.float32) * 0.1,
        },
    }


def _ref(p, x):
    h = layers.geglu(p["0"], x)
    return layers.linear(p["1"], h)


@pytest.mark.parametrize("shape", [(2, 256, 128, 512), (1, 128, 256, 1024)])
def test_ffn_kernel_matches_layers(shape):
    b, s, c, hidden = shape
    p = _params(None, c, hidden)
    x = jax.random.normal(jax.random.key(2), (b, s, c), jnp.float32)
    want = np.asarray(_ref(p, x))
    assert ffn_ops.supported(x, p["0"]["proj"]["kernel"])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ffn_ops._ffn(
            x, p["0"]["proj"]["kernel"], p["0"]["proj"]["bias"],
            p["1"]["kernel"], p["1"]["bias"],
        ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_ffn_grad_falls_back_to_xla():
    c, hidden = 128, 512
    p = _params(None, c, hidden)
    x = jax.random.normal(jax.random.key(3), (1, 128, c), jnp.float32)

    def loss(x):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ffn_ops._ffn(
                x, p["0"]["proj"]["kernel"], p["0"]["proj"]["bias"],
                p["1"]["kernel"], p["1"]["bias"],
            ) ** 2)

    def loss_ref(x):
        return jnp.sum(_ref(p, x) ** 2)

    g = jax.grad(loss)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-3, rtol=1e-4)


def test_geglu_ffn_dispatch_off_tpu_uses_layers():
    """On CPU (impl=auto) the layer path runs and matches shapes."""
    c, hidden = 128, 512
    p = _params(None, c, hidden)
    x = jax.random.normal(jax.random.key(4), (1, 128, c), jnp.float32)
    out = ffn_ops.geglu_ffn(p, x, impl="auto")
    want = np.asarray(_ref(p, x))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_supported_gate():
    x = jnp.zeros((2, 256, 320), jnp.bfloat16)
    w1 = jnp.zeros((320, 2560), jnp.bfloat16)
    assert ffn_ops.supported(x, w1)
    assert not ffn_ops.supported(jnp.zeros((2, 100, 320), jnp.bfloat16), w1)  # M % 128
    assert not ffn_ops.supported(jnp.zeros((2, 256, 300), jnp.bfloat16),
                                 jnp.zeros((300, 2400), jnp.bfloat16))  # C % 128
