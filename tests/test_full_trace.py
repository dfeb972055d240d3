"""Abstract (eval_shape) traces of the FULL-SIZE models with the Pallas
kernel gates forced on.

The Pallas code paths are TPU-gated, so CPU test runs never trace them at
real sizes — which let a custom-VJP dtype mismatch (f32 LoRA-merged q vs
frozen bf16 text k/v through flash cross-attention) reach the chip in the
round-2 train bench.  eval_shape never allocates or compiles, so tracing the
real SD1.5 topology is cheap; it catches aval mismatches, shape bugs, and
gate errors in every kernel wrapper."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # full-topology traces take minutes on one core

from stable_diffusion_tpu import schedulers as S
from stable_diffusion_tpu import training as T
from stable_diffusion_tpu.models import clip as clip_m
from stable_diffusion_tpu.models import unet as unet_m
from stable_diffusion_tpu.models import vae as vae_m


@pytest.fixture
def fake_tpu(monkeypatch):
    """Force the on-TPU kernel gates during abstract tracing."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def _full_params(dtype):
    ucfg, tcfg, vcfg = (unet_m.UNetConfig.sd15(), clip_m.CLIPTextConfig.vit_l(),
                        vae_m.VAEConfig())
    key = jax.random.key(0)
    shapes = {
        "unet": jax.eval_shape(lambda k: unet_m.init_unet(k, ucfg, dtype=dtype), key),
        "text_encoder": jax.eval_shape(
            lambda k: clip_m.init_text_model(k, tcfg, dtype=dtype), key),
        "vae": jax.eval_shape(lambda k: vae_m.init_vae(k, vcfg, dtype=dtype), key),
    }
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return params, ucfg, tcfg, vcfg


def test_full_train_step_traces(fake_tpu):
    params, ucfg, tcfg, vcfg = _full_params(jnp.bfloat16)
    cfg = T.TrainConfig(rank=128, alpha=128.0, use_ema=True,
                        gradient_checkpointing=True, grad_accum_steps=2,
                        lora_targets=("q_proj", "k_proj", "v_proj", "out_proj"))
    state = T.init_train_state(jax.random.key(0), params, cfg)
    step_fn = T.make_train_step(params, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
                                schedule=S.make_schedule(), train_cfg=cfg)
    b = 4
    batch = {
        "images": jax.ShapeDtypeStruct((b, 512, 512, 3), jnp.bfloat16),
        "input_ids": jax.ShapeDtypeStruct((b, 77), jnp.int32),
        "t": jax.ShapeDtypeStruct((b,), jnp.int32),
        "noise": jax.ShapeDtypeStruct((b, 64, 64, 4), jnp.bfloat16),
        "vae_noise": jax.ShapeDtypeStruct((b, 64, 64, 4), jnp.bfloat16),
    }
    out = jax.eval_shape(step_fn, state, batch)
    assert out is not None


@pytest.mark.parametrize("size,version", [(512, "1.5"), (768, "2.1")])
def test_full_unet_fwd_traces(fake_tpu, size, version):
    dtype = jnp.bfloat16
    ucfg = unet_m.UNetConfig.sd15() if version == "1.5" else unet_m.UNetConfig.sd21()
    shapes = jax.eval_shape(
        lambda k: unet_m.init_unet(k, ucfg, dtype=dtype), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    lat = jax.ShapeDtypeStruct((2, size // 8, size // 8, 4), dtype)
    cond = jax.ShapeDtypeStruct((2, 77, ucfg.cross_attention_dim), dtype)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    out = jax.eval_shape(
        lambda p, x, ts, c: unet_m.unet_apply(p, x, ts, c, ucfg, impl="auto"),
        params, lat, t, cond)
    assert out.shape == (2, size // 8, size // 8, 4)


def test_full_vae_decode_traces(fake_tpu):
    params, ucfg, tcfg, vcfg = _full_params(jnp.bfloat16)
    z = jax.ShapeDtypeStruct((1, 64, 64, 4), jnp.bfloat16)
    out = jax.eval_shape(
        lambda p, z: vae_m.decode(p, z, vcfg, impl="auto"), params["vae"], z)
    assert out.shape == (1, 512, 512, 3)
