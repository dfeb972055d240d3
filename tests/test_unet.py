"""Parity of UNet blocks and the full (shrunken) UNet vs the reference
(models/unet/unet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from stable_diffusion_tpu.models import unet as junet
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict
from tests import ref


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_time_embedding(rng):
    un = ref.load("models.unet.unet")
    torch.manual_seed(0)
    m = un.TimeEmbedding(t_embed_dim=32)
    t = np.array([0, 1, 999], dtype=np.int64)
    want = m(torch.from_numpy(t)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    cfg = junet.UNetConfig(t_embed_dim=32)
    got = np.asarray(junet.time_embedding_apply(p, jnp.asarray(t), cfg, jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resblock(rng):
    un = ref.load("models.unet.unet")
    torch.manual_seed(0)
    m = un.UNet_ResBlock(32, 64, t_embed_dim=48)
    x = rng.standard_normal((2, 32, 6, 6), dtype=np.float32)
    t = rng.standard_normal((2, 48), dtype=np.float32)
    want = to_nhwc(m(torch.from_numpy(x), torch.from_numpy(t)).detach().numpy())
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(junet.resblock_apply(p, jnp.asarray(to_nhwc(x)), jnp.asarray(t), eps=1e-5))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_transformer_encoder(rng):
    un = ref.load("models.unet.unet")
    torch.manual_seed(0)
    # channels = embedding_dim * num_heads (reference unet.py:65)
    m = un.UNet_TransformerEncoder(num_heads=4, embedding_dim=8, cond_dim=24, use_lora=False)
    x = rng.standard_normal((2, 32, 6, 6), dtype=np.float32)
    cond = rng.standard_normal((2, 7, 24), dtype=np.float32)
    want = to_nhwc(m(torch.from_numpy(x), torch.from_numpy(cond)).detach().numpy())
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(
        junet.transformer_encoder_apply(
            p, jnp.asarray(to_nhwc(x)), jnp.asarray(cond), num_heads=4, impl="xla"
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def _small_ref_unet():
    """Reference UNet with a small config.  Its bottleneck hardcodes 1280
    channels (unet.py:383-391, the intended block_out_channels[-1]); swap in
    correctly-sized ResBlocks so the small config is consistent."""
    un = ref.load("models.unet.unet")
    torch.manual_seed(0)
    bc = [32, 64, 64, 64]
    m = un.UNet(
        attention_head_dim=[2, 4, 4, 4],
        cross_attention_dim=24,
        block_out_channels=bc,
        t_embed_dim=16,
    )
    m.bottleneck[0] = un.UNet_ResBlock(bc[-1], bc[-1], 16 * 4)
    m.bottleneck[2] = un.UNet_ResBlock(bc[-1], bc[-1], 16 * 4)
    # the decoder also hardcodes ch=320 for the last stage's mid-channel
    # (unet.py:301,310) — the intended value is block_out_channels[0]
    m.decoder.up[3].block[2][0] = un.UNet_ResBlock(bc[0] + bc[0], bc[0], 16 * 4)
    # ...as does the output head (unet.py:398-401): GN(32, 320) + conv 320->4
    m.output[0] = torch.nn.GroupNorm(32, bc[0], eps=1e-5, affine=True)
    m.output[2] = torch.nn.Conv2d(bc[0], 4, kernel_size=3, stride=1, padding=1)
    cfg = junet.UNetConfig(
        block_out_channels=tuple(bc),
        attention_head_dim=(2, 4, 4, 4),
        cross_attention_dim=24,
        t_embed_dim=16,
    )
    return m, cfg


def test_full_unet_forward(rng):
    m, cfg = _small_ref_unet()
    x = rng.standard_normal((2, 4, 16, 16), dtype=np.float32)
    t = np.array([999], dtype=np.int64)
    cond = rng.standard_normal((2, 7, 24), dtype=np.float32)
    with torch.no_grad():
        want = to_nhwc(
            m(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)).numpy()
        )
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(
        junet.unet_apply(
            p, jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(cond), cfg, impl="xla"
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_init_tree_matches_reference_shapes():
    m, cfg = _small_ref_unet()
    want = {k: tuple(v.shape) for k, v in _flat(from_torch_state_dict(m.state_dict())).items()}
    got = {
        k: tuple(v.shape)
        for k, v in _flat(junet.init_unet(jax.random.key(0), cfg)).items()
    }
    assert want == got


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = v
    return out
