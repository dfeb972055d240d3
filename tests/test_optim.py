"""optim.py: LR schedules and the 8-bit AdamW (bnb.AdamW8bit analog,
reference train_lora_dreambooth.py:242-254 and :339-352)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from stable_diffusion_tpu import optim


def test_lr_schedules():
    const = optim.make_lr_schedule("constant", 1e-3)
    assert float(const(0)) == float(const(999)) == pytest.approx(1e-3)

    warm = optim.make_lr_schedule("constant_with_warmup", 1e-3, warmup_steps=10)
    assert float(warm(0)) == pytest.approx(0.0)
    assert float(warm(5)) == pytest.approx(5e-4)
    assert float(warm(10)) == pytest.approx(1e-3)
    assert float(warm(500)) == pytest.approx(1e-3)

    cos = optim.make_lr_schedule("cosine", 1e-3, warmup_steps=10, total_steps=100)
    assert float(cos(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(cos(100)) < float(cos(50)) < float(cos(10))

    with pytest.raises(ValueError):
        optim.make_lr_schedule("nope", 1e-3)


def _tree():
    k = jax.random.key(0)
    ks = jax.random.split(k, 3)
    return {
        "a": {"kernel": jax.random.normal(ks[0], (32, 48)) * 0.1},
        "b": jax.random.normal(ks[1], (7, 3)),  # non-multiple of BLOCK
        "c": jax.random.normal(ks[2], (5,)),
    }


def test_quantize_roundtrip():
    x = jax.random.normal(jax.random.key(1), (13, 37)) * 3.0
    q = optim._quantize(x)
    back = optim._dequantize(q, x.shape)
    assert q.q.dtype == jnp.int8
    atol = float(np.max(np.abs(np.asarray(x)))) / 127 * 1.01  # half-ulp per block
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=atol)


def test_quantize_log_roundtrip():
    """The v-moment log code: a few % relative error over 7 decades, no
    zero-collapse (the failure mode of linear int8 under a sqrt-denominator)."""
    x = jnp.concatenate([
        jnp.logspace(-7, 0, 200), jnp.zeros((56,)),  # one 256 block
    ])
    q = optim._quantize_log(x)
    back = np.asarray(optim._dequantize_log(q, x.shape))
    xs = np.asarray(x)
    nz = xs > 0
    rel = np.abs(back[nz] - xs[nz]) / xs[nz]
    assert rel.max() < 0.04, rel.max()          # half a log-step
    assert np.all(back[~nz] == 0.0)
    assert np.all(back[nz] > 0.0)               # no zero-collapse


def test_adamw_8bit_matches_adamw():
    """adamw_8bit tracks optax.adamw to 8-bit-state precision: the worst
    per-coordinate deviation stays a small fraction of the distance the
    params actually travel."""
    params8 = _tree()
    params32 = jax.tree.map(lambda x: x, params8)
    init = jax.tree.map(np.asarray, params32)
    tx8 = optim.adamw_8bit(1e-2, weight_decay=1e-2)
    tx32 = optax.adamw(1e-2, weight_decay=1e-2)
    s8, s32 = tx8.init(params8), tx32.init(params32)

    for i in range(10):
        grads = jax.tree.map(
            lambda p: jnp.sin(p * (i + 1)),  # deterministic pseudo-grads
            params32,
        )
        u8, s8 = tx8.update(grads, s8, params8)
        u32, s32 = tx32.update(grads, s32, params32)
        params8 = optax.apply_updates(params8, u8)
        params32 = optax.apply_updates(params32, u32)

    err = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(params8), jax.tree.leaves(params32))
    ])
    travel = np.concatenate([
        np.abs(np.asarray(a) - b).ravel()
        for a, b in zip(jax.tree.leaves(params32), jax.tree.leaves(init))
    ])
    # mean deviation ~2% of mean travel (8-bit state precision); worst
    # single coordinate stays bounded
    assert err.mean() < 0.05 * travel.mean(), (err.mean(), travel.mean())
    assert err.max() < 0.3 * travel.max(), (err.max(), travel.max())


def test_adamw_8bit_state_memory():
    """The flag must change optimizer-state memory measurably: int8 moments
    are ~4x smaller than f32 ones."""
    params = {"w": jnp.zeros((1024, 1024))}
    n8 = optim.opt_state_nbytes(optim.adamw_8bit(1e-3).init(params))
    n32 = optim.opt_state_nbytes(optax.adamw(1e-3).init(params))
    assert n8 < n32 / 3.5, (n8, n32)


def test_adamw_8bit_under_jit_and_train_step():
    """adamw_8bit inside the real jitted train step (use_8bit_adam=True)."""
    from stable_diffusion_tpu import schedulers as S
    from stable_diffusion_tpu import training as T
    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m

    ucfg = unet_m.UNetConfig(
        block_out_channels=(32, 64, 64, 64), attention_head_dim=(2, 4, 4, 4),
        cross_attention_dim=32, t_embed_dim=16,
    )
    tcfg = clip_m.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=77, vocab_size=64,
    )
    vcfg = vae_m.VAEConfig(ch_mult=(1, 1, 1, 1), base_channels=32)
    ks = jax.random.split(jax.random.key(0), 4)
    base = {
        "unet": unet_m.init_unet(ks[0], ucfg),
        "text_encoder": clip_m.init_text_model(ks[1], tcfg),
        "vae": vae_m.init_vae(ks[2], vcfg),
    }
    cfg = T.TrainConfig(rank=2, alpha=2.0, learning_rate=1e-3,
                        use_8bit_adam=True, lr_schedule="constant_with_warmup",
                        lr_warmup_steps=2, lr_total_steps=10)
    schedule = S.make_schedule()
    state = T.init_train_state(ks[3], base, cfg)
    step_fn = jax.jit(
        T.make_train_step(base, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
                          schedule=schedule, train_cfg=cfg, impl="xla")
    )
    eval_fn = jax.jit(
        T.make_eval_step(base, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
                         schedule=schedule, train_cfg=cfg, impl="xla")
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    t, noise, vnoise = T.sample_batch_noise(jax.random.key(5), img)
    batch = {"images": img, "input_ids": jnp.zeros((2, 77), jnp.int32),
             "t": t, "noise": noise, "vae_noise": vnoise}
    before = jax.tree.map(np.asarray, state["lora"])
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state["lora"]))
    )
    assert moved
    # eval step: pure loss, no state change
    tl = float(eval_fn(state, batch))
    assert np.isfinite(tl)
