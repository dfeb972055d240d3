"""DDPM / DDIM diffusion processes, TPU-first.

Re-design of the reference samplers (models/scheduler/ddpm.py:10-89,
ddim.py:7-96) as *pure functions*: schedules are precomputed numpy tables
built once at trace-set-up time (static), timestep sequences are static
int arrays, and the per-step transition functions take traced timesteps and
gather from the tables — so the whole denoise loop compiles into a single
``lax.scan`` with no host round-trips.

Schedule math matches the reference bit-for-bit:
  * linear: betas = linspace(sqrt(b0), sqrt(b1), T)^2, b0=0.00085, b1=0.012
    (ddpm.py:12)
  * cosine: Nichol-Dhariwal alphas_hat, clipped per the reference
    (ddpm.py:19-27)
  * DDPM inference timesteps: (arange(S) * (T//S)).round()[::-1] (ddpm.py:29-32)
  * DDIM adds a +1 offset (ddim.py:31)
  * strength truncation drops the head of the sequence (ddpm.py:42-44)
  * prediction_type "epsilon" | "v_prediction" handled by the DDIM step
    (ddim.py:58-70); the reference's DDPM.from_config crash with
    prediction_type (SURVEY 2.12.1) is fixed by supporting it here.

Known deliberate deviation: the reference's DDIM variance uses
``alphas[t]`` where the DDIM paper wants ``alphas_hat[t]`` (ddim.py:73-76,
SURVEY 2.12.13); it is dead code at the default eta=0.  We implement the
correct alphas_hat form; ``eta=0`` is bit-identical to the reference.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Static schedule tables (host numpy; closed over by jitted fns)."""

    betas: np.ndarray          # (T,) f32
    alphas: np.ndarray         # (T,) f32
    alphas_hat: np.ndarray     # (T,) f32 cumulative products
    num_train_timesteps: int
    prediction_type: str = "epsilon"

    def table(self) -> jnp.ndarray:
        return jnp.asarray(self.alphas_hat)


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    use_cosine_schedule: bool = False,
    prediction_type: str = "epsilon",
) -> DiffusionSchedule:
    T = num_train_timesteps
    betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float32) ** 2
    alphas = 1.0 - betas
    alphas_hat = np.cumprod(alphas, dtype=np.float32)
    if use_cosine_schedule:
        # float32 throughout, matching the reference's torch-f32 evaluation
        s = np.float32(0.008)
        t = np.arange(0, T + 1, dtype=np.float32)
        f = np.cos((t / np.float32(T) + s) / (1 + s) * np.float32(np.pi) / 2) ** 2
        ah = (f / f[0]).astype(np.float32)
        betas = np.clip(1.0 - ah[1:] / ah[:-1], 0.0, 0.999).astype(np.float32)
        alphas = np.clip(1.0 - betas, 0.0, 0.999).astype(np.float32)
        alphas_hat = np.clip(ah[1:], 0.0, 0.999).astype(np.float32)
    return DiffusionSchedule(betas, alphas, alphas_hat, T, prediction_type)


def schedule_from_config(cfg_dir: str, use_cosine_schedule: bool = False) -> DiffusionSchedule:
    """Build from a stock diffusers scheduler_config.json
    (reference ddim.py:89-96)."""
    with open(os.path.join(cfg_dir, "scheduler_config.json")) as f:
        cfg = json.load(f)
    return make_schedule(
        num_train_timesteps=cfg["num_train_timesteps"],
        beta_start=cfg["beta_start"],
        beta_end=cfg["beta_end"],
        use_cosine_schedule=use_cosine_schedule,
        prediction_type=cfg.get("prediction_type", "epsilon"),
    )


def inference_timesteps(
    schedule: DiffusionSchedule, steps: int, *, kind: str = "ddpm"
) -> np.ndarray:
    """Descending int64 timestep sequence (reference ddpm.py:29-32 /
    ddim.py:29-32; DDIM carries the reference's +1 offset)."""
    T = schedule.num_train_timesteps
    step = T // steps
    ts = np.arange(0, steps) * step
    if kind == "ddim":
        ts = ts + 1
    return np.asarray(np.round(ts)[::-1].copy(), dtype=np.int64)


def apply_strength(timesteps: np.ndarray, strength: float) -> np.ndarray:
    """Drop the head of the sequence (reference ddpm.py:42-44)."""
    steps = len(timesteps)
    start = steps - int(steps * strength)
    return timesteps[start:]


def prev_timesteps(schedule: DiffusionSchedule, timesteps: np.ndarray, steps: int) -> np.ndarray:
    """t - T//S for each step (reference ddpm.py:38-40); may go negative,
    which the step functions map to alphas_hat = 1."""
    return timesteps - schedule.num_train_timesteps // steps


def _gather_ah(alphas_hat: jax.Array, t: jax.Array) -> jax.Array:
    """alphas_hat[t] with alphas_hat[t<0] := 1.0 (boundary convention)."""
    safe = jnp.clip(t, 0, alphas_hat.shape[0] - 1)
    return jnp.where(t < 0, jnp.float32(1.0), alphas_hat[safe])


def forward_process(
    alphas_hat: jax.Array, x0: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """q(x_t | x_0) sample (reference ddpm.py:47-57).  t: (B,) or scalar."""
    ah = alphas_hat[t].astype(x0.dtype)
    while ah.ndim < x0.ndim:
        ah = ah[..., None]
    return jnp.sqrt(ah) * x0 + jnp.sqrt(1.0 - ah) * noise


def ddpm_step(
    alphas_hat: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    eps_hat: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Ancestral DDPM reverse step (reference ddpm.py:62-82).

    All schedule values are gathered from the table with traced t, so this
    scans.  ``noise`` must be pre-sampled (fresh per step); it is only added
    when t > 0, matching the reference.
    """
    f32 = jnp.float32
    ah_t = _gather_ah(alphas_hat, t).astype(f32)
    ah_prev = _gather_ah(alphas_hat, prev_t).astype(f32)
    cur_alpha = jnp.clip(ah_t / ah_prev, 0.0, 0.999)
    cur_beta = 1.0 - cur_alpha

    xf = x_t.astype(f32)
    mu = jax.lax.rsqrt(cur_alpha) * (
        xf - (1.0 - cur_alpha) * jax.lax.rsqrt(1.0 - ah_t) * eps_hat.astype(f32)
    )
    variance = jnp.maximum((1.0 - ah_prev) / (1.0 - ah_t) * cur_beta, 1e-20)
    stdev = jnp.where(t > 0, jnp.sqrt(variance), 0.0)
    return (mu + stdev * noise.astype(f32)).astype(x_t.dtype)


def ddim_step(
    alphas_hat: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    prev_t: jax.Array,
    model_output: jax.Array,
    *,
    prediction_type: str = "epsilon",
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """DDIM reverse step (reference ddim.py:58-87), epsilon- or v-prediction."""
    f32 = jnp.float32
    ah_t = _gather_ah(alphas_hat, t).astype(f32)
    ah_prev = _gather_ah(alphas_hat, prev_t).astype(f32)
    beta_hat_t = 1.0 - ah_t

    xf = x_t.astype(f32)
    mo = model_output.astype(f32)
    if prediction_type == "epsilon":
        pred_x0 = (xf - jnp.sqrt(beta_hat_t) * mo) * jax.lax.rsqrt(ah_t)
        pred_eps = mo
    elif prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(ah_t) * xf - jnp.sqrt(beta_hat_t) * mo
        pred_eps = jnp.sqrt(ah_t) * mo + jnp.sqrt(beta_hat_t) * xf
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")

    variance_t = (1.0 - ah_prev) / (1.0 - ah_t) * (1.0 - ah_t / ah_prev)
    std_dev_t = jnp.sqrt(jnp.maximum(eta * variance_t, 0.0))
    direction = jnp.sqrt(jnp.maximum(1.0 - ah_prev - std_dev_t**2, 0.0)) * pred_eps
    prev_x = jnp.sqrt(ah_prev) * pred_x0 + direction
    if eta > 0:
        assert noise is not None, "eta > 0 needs per-step noise"
        prev_x = prev_x + std_dev_t * noise.astype(f32)
    return prev_x.astype(x_t.dtype)


def v_prediction_targets(alphas_hat: jax.Array, x0: jax.Array, noise: jax.Array, t: jax.Array):
    """v = sqrt(ah) * eps - sqrt(1-ah) * x0 (training target for v-pred)."""
    ah = alphas_hat[t].astype(x0.dtype)
    while ah.ndim < x0.ndim:
        ah = ah[..., None]
    return jnp.sqrt(ah) * noise - jnp.sqrt(1.0 - ah) * x0
