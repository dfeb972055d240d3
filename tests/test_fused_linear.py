"""ops/linear.py — fused (LN->)matmul(->+residual) kernel parity.

Kernel semantics are checked in Pallas interpret mode against the plain XLA
formulation (models/layers.layer_norm + dot + adds); gradients go through
the recompute VJP and must match jax.grad of the XLA composite.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the production default is OFF (round-3 e2e verdict, ops/linear.py) — these
# tests exist to keep the kernels themselves correct for re-measurement
os.environ.setdefault("SD_TPU_FUSED_MM", "all")

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.ops import linear as fl


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, m, k, n, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((2, m // 2, k)), dtype)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, dtype)
    b = jnp.asarray(rng.standard_normal((n,)), dtype)
    res = jnp.asarray(rng.standard_normal((2, m // 2, n)), dtype)
    gamma = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    return x, w, b, res, gamma, beta


@pytest.mark.parametrize("m,k,n", [(256, 320, 1536), (128, 640, 640)])
def test_ln_matmul_interpret(rng, m, k, n):
    from jax.experimental.pallas import tpu as pltpu

    x, w, b, res, gamma, beta = _mk(rng, m, k, n)
    ln = {"scale": gamma, "bias": beta}
    assert fl.supported(m, k, n, 4)  # the kernel, not the XLA fallback
    with pltpu.force_tpu_interpret_mode():
        got = fl.ln_matmul(ln, x, w, b, impl="pallas")
    want = jnp.dot(layers.layer_norm(ln, x), w) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("m,k,n", [(256, 512, 320), (128, 1280, 1280)])
def test_matmul_residual_interpret(rng, m, k, n):
    from jax.experimental.pallas import tpu as pltpu

    x, w, b, res, _, _ = _mk(rng, m, k, n)
    assert fl.supported(m, k, n, 4)  # n=320 rides the single-block plan
    with pltpu.force_tpu_interpret_mode():
        got = fl.matmul_residual(x, w, b, res, impl="pallas")
    want = jnp.dot(x, w) + b + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ln_matmul_no_bias_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    x, w, _, _, gamma, beta = _mk(rng, 128, 320, 384)
    ln = {"scale": gamma, "bias": beta}
    with pltpu.force_tpu_interpret_mode():
        got = fl.ln_matmul(ln, x, w, None, impl="pallas")
    want = jnp.dot(layers.layer_norm(ln, x), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    x, w, b, res, gamma, beta = _mk(rng, 128, 320, 320)
    ln = {"scale": gamma, "bias": beta}

    def f_fused(x, gamma, beta, w, b, res):
        with pltpu.force_tpu_interpret_mode():
            h = fl.ln_matmul({"scale": gamma, "bias": beta}, x, w, b,
                             impl="pallas")
            return jnp.sum(fl.matmul_residual(h, w.T, b[:320], res,
                                              impl="pallas") ** 2)

    def f_xla(x, gamma, beta, w, b, res):
        h = jnp.dot(layers.layer_norm({"scale": gamma, "bias": beta}, x), w) + b
        return jnp.sum((jnp.dot(h, w.T) + b[:320] + res) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4, 5))(x, gamma, beta, w, b, res)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2, 3, 4, 5))(x, gamma, beta, w, b, res)
    for name, a, bb in zip("x gamma beta w b res".split(), g1, g2):
        r = (np.abs(np.asarray(a) - np.asarray(bb)).max()
             / (np.abs(np.asarray(bb)).max() + 1e-9))
        assert r < 2e-5, (name, r)


def test_gn_matmul_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c, n = 2, 16, 16, 320, 320
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((c, n)) * 0.05, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    gn = {"scale": jnp.asarray(rng.standard_normal((c,)), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal((c,)), jnp.float32)}
    assert fl.gn_supported(b * h * w, h * w, c, n, 4)
    with pltpu.force_tpu_interpret_mode():
        got = fl.gn_matmul(gn, x, wk, bb, eps=1e-6, impl="pallas")
    want = jnp.dot(layers.group_norm(gn, x, eps=1e-6), wk) + bb
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def f_fused(gamma, beta, x, wk, bb):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fl.gn_matmul({"scale": gamma, "bias": beta}, x, wk,
                                        bb, eps=1e-6, impl="pallas") ** 2)

    def f_xla(gamma, beta, x, wk, bb):
        return jnp.sum((jnp.dot(layers.group_norm(
            {"scale": gamma, "bias": beta}, x, eps=1e-6), wk) + bb) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(gn["scale"], gn["bias"], x, wk, bb)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2, 3, 4))(gn["scale"], gn["bias"], x, wk, bb)
    for name, a, b2 in zip("gamma beta x w b".split(), g1, g2):
        r = (np.abs(np.asarray(a) - np.asarray(b2)).max()
             / (np.abs(np.asarray(b2)).max() + 1e-9))
        assert r < 3e-5, (name, r)


def test_w8a8_fused_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    m, k, n = 128, 320, 384
    x = jnp.asarray(rng.standard_normal((1, m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.01, 0.02, (1, n)), jnp.float32)
    act = jnp.asarray(3.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, m, n)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    ln = {"scale": gamma, "bias": beta}

    with pltpu.force_tpu_interpret_mode():
        got_ln = fl.ln_matmul_w8a8(ln, x, wq, ws, act, b, impl="pallas")
        got_nl = fl.matmul_w8a8(x, wq, ws, act, b, residual=res, impl="pallas")
    want_ln = fl._q_mm_xla(x, gamma, beta, act, wq, ws.reshape(-1), b, None, 1e-5)
    want_nl = fl._q_mm_xla(x, None, None, act, wq, ws.reshape(-1), b, res, 1e-5)
    # int8 rounding can flip +-1 LSB at exact .5 boundaries; compare dequant
    np.testing.assert_allclose(np.asarray(got_ln), np.asarray(want_ln),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_nl), np.asarray(want_nl),
                               rtol=1e-4, atol=1e-4)

    # inference-only: gradients must raise, not silently zero
    with pltpu.force_tpu_interpret_mode():
        with pytest.raises(NotImplementedError):
            jax.grad(lambda xx: jnp.sum(
                fl.ln_matmul_w8a8(ln, xx, wq, ws, act, b, impl="pallas")))(x)


def test_unsupported_falls_back(rng):
    # m not a multiple of 128 -> XLA fallback, still correct
    x = jnp.asarray(rng.standard_normal((1, 100, 320)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((320, 320)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((320,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, 100, 320)), jnp.float32)
    got = fl.matmul_residual(x, w, b, res, impl="pallas")
    want = jnp.dot(x, w) + b + res
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_mm_env_hatch(rng, monkeypatch):
    # SD_TPU_FUSED_MM=0 must disable every bf16 fused-matmul support gate
    monkeypatch.setenv("SD_TPU_FUSED_MM", "0")
    assert not fl.supported(512, 320, 320)
    assert not fl.gn_supported(512, 512, 320, 320)
    # ...and the public entry points still compute correctly via XLA
    x = jnp.asarray(rng.standard_normal((1, 512, 320)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((320, 320)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((320,)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, 512, 320)), jnp.float32)
    got = fl.matmul_residual(x, w, b, res, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.dot(x, w) + b + res),
                               rtol=1e-5, atol=1e-5)
    monkeypatch.setenv("SD_TPU_FUSED_MM", "1")
    assert fl.supported(512, 320, 320)
