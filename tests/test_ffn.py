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


def test_ln_ffn_res_fused_matches_layers():
    """Fused LN + GeGLU-FFN + residual == the layer path, both layouts."""
    for (b, s, c, hidden) in [(2, 256, 128, 512), (1, 128, 512, 2048)]:
        p = _params(None, c, hidden)
        ln = {"scale": jnp.asarray(np.random.default_rng(5).standard_normal(c), jnp.float32),
              "bias": jnp.asarray(np.random.default_rng(6).standard_normal(c), jnp.float32)}
        x = jax.random.normal(jax.random.key(7), (b, s, c), jnp.float32)
        want = np.asarray(_ref(p, layers.layer_norm(ln, x)) + x)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(ffn_ops.geglu_ffn(
                p, x, ln_params=ln, residual=x, impl="pallas"))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_ln_ffn_res_grad_matches():
    c, hidden = 128, 512
    p = _params(None, c, hidden)
    ln = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    x = jax.random.normal(jax.random.key(8), (1, 128, c), jnp.float32)

    def loss_fused(x):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(ffn_ops.geglu_ffn(
                p, x, ln_params=ln, residual=x, impl="pallas") ** 2)

    def loss_ref(x):
        return jnp.sum((_ref(p, layers.layer_norm(ln, x)) + x) ** 2)

    g1 = np.asarray(jax.grad(loss_fused)(x))
    g2 = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(g1, g2, atol=1e-3, rtol=1e-3)


def test_n_outer_layout_picked_for_wide_c():
    # stage2-like shape: the persistent-acc n-outer layout must be chosen
    layout, bm, bn = ffn_ops._plan(512, 1280, 5120, 2)
    assert layout == "no", (layout, bm, bn)
    # stage0-like: everything fits resident -> m-outer single-n
    layout, bm, bn = ffn_ops._plan(8192, 320, 1280, 2)
    assert layout == "mo" and bn == 1280


def test_w8a8_ffn_kernel_matches_xla_int8():
    from stable_diffusion_tpu.ops import quantize as Q

    b, s, c, hidden = 1, 128, 128, 512
    p = _params(None, c, hidden)
    q0, s0 = Q.quantize_tensor(p["0"]["proj"]["kernel"], axis=0)
    q1, s1 = Q.quantize_tensor(p["1"]["kernel"], axis=0)
    pq = {
        "0": {"proj": {"kernel_q": q0, "kernel_scale": s0,
                       "bias": p["0"]["proj"]["bias"],
                       "act_scale": jnp.asarray(4.0, jnp.float32)}},
        "1": {"kernel_q": q1, "kernel_scale": s1, "bias": p["1"]["bias"],
              "act_scale": jnp.asarray(6.0, jnp.float32)},
    }
    x = jax.random.normal(jax.random.key(2), (b, s, c), jnp.float32) * 0.5
    ln = {"scale": jnp.ones((c,), jnp.float32) * 1.1,
          "bias": jnp.zeros((c,), jnp.float32)}
    res = jax.random.normal(jax.random.key(3), (b, s, c), jnp.float32)

    want = np.asarray(ffn_ops._ffn_q_xla(
        x, ln["scale"], ln["bias"], pq["0"]["proj"], pq["1"], res, 1e-5))
    assert ffn_ops.q_supported(x, hidden)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ffn_ops.geglu_ffn(
            pq, x, ln_params=ln, residual=res, impl="pallas"))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 5e-3, rel

    # gradients must raise (inference-only), not silently zero
    with pltpu.force_tpu_interpret_mode():
        with pytest.raises(NotImplementedError):
            jax.grad(lambda xx: jnp.sum(ffn_ops.geglu_ffn(
                pq, xx, ln_params=ln, residual=res, impl="pallas")))(x)
