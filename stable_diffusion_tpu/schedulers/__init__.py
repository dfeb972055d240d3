"""Diffusion samplers as pure functions over precomputed schedule tables."""

from stable_diffusion_tpu.schedulers.schedule import (  # noqa: F401
    DiffusionSchedule,
    make_schedule,
    inference_timesteps,
    apply_strength,
    forward_process,
    ddpm_step,
    ddim_step,
    v_prediction_targets,
)
