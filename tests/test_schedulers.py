"""Parity of schedules and reverse processes vs reference samplers
(models/scheduler/ddpm.py, ddim.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import pytest

from stable_diffusion_tpu import schedulers as S
from tests import ref


@pytest.fixture(scope="module")
def ddpm_ref():
    return ref.load("models.scheduler.ddpm").DDPMSampler()


@pytest.fixture(scope="module")
def ddim_ref():
    return ref.load("models.scheduler.ddim").DDIMSampler()


def test_linear_schedule_tables(ddpm_ref):
    sched = S.make_schedule()
    np.testing.assert_allclose(sched.betas, ddpm_ref.betas.numpy(), atol=1e-7)
    np.testing.assert_allclose(sched.alphas_hat, ddpm_ref.alphas_hat.numpy(), rtol=2e-6)


def test_cosine_schedule_tables():
    mod = ref.load("models.scheduler.ddpm")
    r = mod.DDPMSampler(use_cosine_schedule=True)
    sched = S.make_schedule(use_cosine_schedule=True)
    # the reference evaluates f(t) in float32 (torch int-tensor true division);
    # we use float64 — agreement is to f32 rounding (~6e-7 absolute)
    np.testing.assert_allclose(sched.alphas_hat, r.alphas_hat.numpy(), atol=1e-6)
    np.testing.assert_allclose(sched.betas, r.betas.numpy(), atol=1e-6)


def test_inference_timesteps(ddpm_ref, ddim_ref):
    sched = S.make_schedule()
    ddpm_ref._set_inference_steps(50)
    np.testing.assert_array_equal(
        S.inference_timesteps(sched, 50, kind="ddpm"), ddpm_ref.timesteps.numpy()
    )
    ddim_ref._set_inference_steps(50)
    np.testing.assert_array_equal(
        S.inference_timesteps(sched, 50, kind="ddim"), ddim_ref.timesteps.numpy()
    )
    # strength truncation (reference ddpm.py:42-44)
    ddpm_ref._set_inference_steps(50)
    ddpm_ref.set_strength(0.8)
    ts = S.apply_strength(S.inference_timesteps(sched, 50, kind="ddpm"), 0.8)
    np.testing.assert_array_equal(ts, ddpm_ref.timesteps.numpy())
    ddpm_ref._set_inference_steps(1000)


def test_forward_process(ddpm_ref, rng):
    sched = S.make_schedule()
    x0 = rng.standard_normal((2, 4, 8, 8), dtype=np.float32)
    noise = rng.standard_normal((2, 4, 8, 8), dtype=np.float32)
    t = np.array([10, 500])
    want, _ = ddpm_ref.forward_process(
        torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)
    )
    got = S.forward_process(
        jnp.asarray(sched.alphas_hat), jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_ddpm_reverse_step(ddpm_ref, rng):
    sched = S.make_schedule()
    ddpm_ref._set_inference_steps(50)
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    eps = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    noise = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    # The reference draws its own fresh noise inside reverse_process
    # (ddpm.py:79), so we verify the deterministic mean term (its formula at
    # ddpm.py:74) by passing zero noise on our side.
    for t in [int(ddpm_ref.timesteps[0]), 500, 20, 0]:
        prev_t = t - 1000 // 50
        got = S.ddpm_step(
            jnp.asarray(sched.alphas_hat),
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(prev_t),
            jnp.asarray(eps),
            jnp.zeros_like(jnp.asarray(x)),
        )
        alpha_hat_t = float(sched.alphas_hat[t])
        prev_ah = float(sched.alphas_hat[prev_t]) if prev_t >= 0 else 1.0
        cur_alpha = min(alpha_hat_t / prev_ah, 0.999)
        mu = (x - (1 - cur_alpha) / np.sqrt(1 - alpha_hat_t) * eps) / np.sqrt(cur_alpha)
        np.testing.assert_allclose(np.asarray(got), mu, rtol=2e-4, atol=2e-5)
    ddpm_ref._set_inference_steps(1000)


def test_ddim_reverse_step_epsilon(ddim_ref, rng):
    sched = S.make_schedule()
    ddim_ref._set_inference_steps(50)
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    eps = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    for t in [int(ddim_ref.timesteps[0]), 501, 21, 1]:
        prev_t = t - 1000 // 50
        want = ddim_ref.reverse_process(torch.from_numpy(x), t, torch.from_numpy(eps), eta=0.0)
        got = S.ddim_step(
            jnp.asarray(sched.alphas_hat),
            jnp.asarray(x),
            jnp.asarray(t),
            jnp.asarray(prev_t),
            jnp.asarray(eps),
            prediction_type="epsilon",
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
    ddim_ref._set_inference_steps(1000)


def test_ddim_reverse_step_vpred(rng):
    mod = ref.load("models.scheduler.ddim")
    r = mod.DDIMSampler(prediction_type="v_prediction")
    r._set_inference_steps(50)
    sched = S.make_schedule(prediction_type="v_prediction")
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    v = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    t = int(r.timesteps[10])
    prev_t = t - 1000 // 50
    want = r.reverse_process(torch.from_numpy(x), t, torch.from_numpy(v), eta=0.0)
    got = S.ddim_step(
        jnp.asarray(sched.alphas_hat),
        jnp.asarray(x),
        jnp.asarray(t),
        jnp.asarray(prev_t),
        jnp.asarray(v),
        prediction_type="v_prediction",
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)
