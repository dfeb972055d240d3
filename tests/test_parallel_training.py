"""Multi-device sharding + training step on the 8-way virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from stable_diffusion_tpu.parallel import mesh as pmesh


def test_mesh_and_param_specs():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = pmesh.make_mesh(model=2)
    assert mesh.devices.shape == (4, 2)
    from jax.sharding import PartitionSpec as P

    k2 = jnp.zeros((8, 16))
    assert pmesh.param_spec("encoder.attn1.q_proj.kernel", k2) == P(None, "model")
    assert pmesh.param_spec("encoder.attn1.out_proj.kernel", k2) == P("model", None)
    assert pmesh.param_spec("mlp.fc1.kernel", k2) == P(None, "model")
    assert pmesh.param_spec("mlp.fc2.kernel", k2) == P("model", None)
    assert pmesh.param_spec("ffn.0.proj.kernel", k2) == P(None, "model")
    assert pmesh.param_spec("ffn.1.kernel", k2) == P("model", None)
    assert pmesh.param_spec("conv_1.kernel", jnp.zeros((3, 3, 4, 8))) == P()
    assert pmesh.param_spec("groupnorm_1.scale", jnp.zeros((8,))) == P()
    assert pmesh.param_spec("attn1.q_proj.bias", jnp.zeros((8,))) == P("model")


def test_dryrun_multichip_entrypoint():
    """The driver-facing multichip dry run: full train step over dp x tp."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_train_step_single_device_loss_decreases(rng):
    """A few steps of the real train step on tiny models: loss finite and
    the LoRA params actually move."""
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
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    base = {
        "unet": unet_m.init_unet(ks[0], ucfg),
        "text_encoder": clip_m.init_text_model(ks[1], tcfg),
        "vae": vae_m.init_vae(ks[2], vcfg),
    }
    cfg = T.TrainConfig(rank=2, alpha=2.0, learning_rate=1e-3)
    schedule = S.make_schedule()
    state = T.init_train_state(ks[3], base, cfg)
    step_fn = jax.jit(
        T.make_train_step(base, ucfg=ucfg, tcfg=tcfg, vcfg=vcfg,
                          schedule=schedule, train_cfg=cfg, impl="xla")
    )
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    t, noise, vnoise = T.sample_batch_noise(jax.random.key(5), img)
    batch = {"images": img, "input_ids": jnp.zeros((2, 77), jnp.int32),
             "t": t, "noise": noise, "vae_noise": vnoise}

    lora_before = jax.tree.map(lambda x: np.asarray(x), state["lora"])
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state["step"]) == 3
    # B starts at zeros; after updates it must have moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or not np.allclose(pair[0], pair[1]),
        jax.tree.map(lambda a, b: (a, np.asarray(b)), lora_before, state["lora"]),
        False,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    assert moved


def test_sharded_inference(rng):
    """pipe.shard(mesh): tensor-parallel generation on the 8-way CPU mesh
    equals the unsharded result (GSPMD collectives, numerics preserved)."""
    import numpy as np
    from stable_diffusion_tpu.models import clip as clip_m
    from stable_diffusion_tpu.models import unet as unet_m
    from stable_diffusion_tpu.models import vae as vae_m
    from stable_diffusion_tpu.pipeline import StableDiffusion

    ucfg = unet_m.UNetConfig(
        block_out_channels=(32, 64, 64, 64), attention_head_dim=(2, 4, 4, 4),
        cross_attention_dim=32, t_embed_dim=16,
    )
    tcfg = clip_m.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=77, vocab_size=64,
    )
    vcfg = vae_m.VAEConfig(ch_mult=(1, 1, 1, 1), base_channels=32)
    ks = jax.random.split(jax.random.key(0), 3)
    params = {
        "unet": unet_m.init_unet(ks[0], ucfg),
        "text_encoder": clip_m.init_text_model(ks[1], tcfg),
        "vae": vae_m.init_vae(ks[2], vcfg),
    }
    kw = dict(prompt="", do_cfg=True, cfg_scale=3.0, inference_steps=2,
              sampler="ddim", img_size=(32, 32), seed=4,
              cond_ids=np.zeros((1, 77), np.int64),
              uncond_ids=np.ones((1, 77), np.int64))
    pipe = StableDiffusion(params=params, unet_config=ucfg, text_config=tcfg,
                           vae_config=vcfg, impl="xla")
    base = pipe.generate(**kw)

    mesh = pmesh.make_mesh(model=2)
    pipe.shard(mesh)
    with mesh:
        sharded = pipe.generate(**kw)
    np.testing.assert_allclose(sharded, base, atol=1e-4)
