"""Parity of text towers vs the reference (models/clip/openclip.py, clip.py)."""

import numpy as np
import jax.numpy as jnp
import torch

from stable_diffusion_tpu.models import clip as jclip
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict
from tests import ref


def test_openclip_text_model(rng):
    oc = ref.load("models.clip.openclip")
    cfg_t = oc.CLIPTextConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        vocab_size=100,
    )
    torch.manual_seed(0)
    m = oc.CLIPTextModel(cfg=cfg_t)
    ids = rng.integers(0, 100, size=(2, 16))
    want = m(torch.from_numpy(ids)).detach().numpy()

    cfg = jclip.CLIPTextConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        vocab_size=100,
        hidden_act="gelu",
    )
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(jclip.text_model_apply(p, jnp.asarray(ids), cfg, impl="xla"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_text_encoder_v1(rng):
    cl = ref.load("models.clip.clip")
    torch.manual_seed(0)
    # reference TextEncoder hardcodes 12 layers / 12 heads (clip.py:11-16);
    # use a small divisible width to keep the single-core CPU run fast.
    m = cl.TextEncoder(n_vocab=60, embed_dim=24, max_len=8)
    ids = rng.integers(0, 60, size=(2, 8))
    want = m(torch.from_numpy(ids)).detach().numpy()

    cfg = jclip.CLIPTextConfig(
        hidden_size=24,
        intermediate_size=96,
        num_hidden_layers=12,
        num_attention_heads=12,
        max_position_embeddings=8,
        vocab_size=60,
        hidden_act="quick_gelu",
    )
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(jclip.text_encoder_v1_apply(p, jnp.asarray(ids), cfg, impl="xla"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_class_encoder(rng):
    cl = ref.load("models.clip.clip")
    torch.manual_seed(0)
    m = cl.ClassEncoder(num_classes=10, emb_dim=16)
    labels = rng.integers(0, 11, size=(4,))
    want = m(torch.from_numpy(labels)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(jclip.class_encoder_apply(p, jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=0)


def test_init_shapes_match_torch():
    """Fresh init builds the same param-tree shape as a torch state_dict."""
    import jax

    oc = ref.load("models.clip.openclip")
    cfg_t = oc.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=100,
    )
    m = oc.CLIPTextModel(cfg=cfg_t)
    want = from_torch_state_dict(m.state_dict())
    cfg = jclip.CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=16, vocab_size=100,
    )
    got = jclip.init_text_model(jax.random.key(0), cfg)
    ws = {k: v.shape for k, v in _flat(want).items()}
    gs = {k: tuple(v.shape) for k, v in _flat(got).items()}
    assert ws == gs


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, path))
        else:
            out[path] = v
    return out
