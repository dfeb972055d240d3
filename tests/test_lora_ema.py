"""Parity of LoRA merge semantics vs reference parametrization (models/lora.py)
and EMA intended behavior (models/ema.py spec — the reference impl is broken,
SURVEY 2.12.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from stable_diffusion_tpu.models import lora as jlora
from stable_diffusion_tpu.models import ema as jema
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict
from tests import ref


def test_lora_linear_merge(rng):
    rl = ref.load("models.lora")
    torch.manual_seed(0)
    lin = torch.nn.Linear(8, 12, bias=False)
    layer = rl.LoraLayer(8, 12, rank=4, alphas=2.0)
    layer.enabled = True
    with torch.no_grad():
        layer.lora_B.normal_()  # reference inits B to zeros; randomize for the test
    want = layer(lin.weight).detach().numpy()  # (out, in)

    base = {"kernel": jnp.asarray(lin.weight.detach().numpy().T)}
    entry = {
        "lora_A": jnp.asarray(layer.lora_A.detach().numpy()),
        "lora_B": jnp.asarray(layer.lora_B.detach().numpy()),
        "alpha": jnp.asarray(2.0),
    }
    merged = jlora.merge_lora({"q_proj": base}, {"q_proj": entry})
    np.testing.assert_allclose(np.asarray(merged["q_proj"]["kernel"]).T, want, atol=1e-5)


def test_lora_conv_merge(rng):
    rl = ref.load("models.lora")
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(6, 10, 3, bias=False)
    layer = rl.LoraConvLayer(6, 10, kernel_size=3, rank=2, alphas=2.0)
    layer.enabled = True
    with torch.no_grad():
        layer.lora_B.normal_()
    want = layer(conv.weight).detach().numpy()  # OIHW

    base = {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    entry = {
        "lora_A": jnp.asarray(layer.lora_A.detach().numpy()),
        "lora_B": jnp.asarray(layer.lora_B.detach().numpy()),
        "alpha": jnp.asarray(2.0),
    }
    merged = jlora.merge_lora({"conv_input": base}, {"conv_input": entry})
    got = np.asarray(merged["conv_input"]["kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lora_target_matching():
    params = {
        "encoder": {
            "attn1": {"q_proj": {"kernel": jnp.zeros((4, 4))}},
            "ffn": {"0": {"proj": {"kernel": jnp.zeros((4, 8))}}},
            "norm": {"scale": jnp.zeros((4,))},
        }
    }
    paths = jlora.match_targets(params, ["q_proj", "ffn.0.proj"])
    assert paths == ["encoder.attn1.q_proj", "encoder.ffn.0.proj"]


def test_lora_fresh_init_is_identity(rng):
    """B starts at zeros (reference lora.py:12-14) so merge is a no-op."""
    params = {"q_proj": {"kernel": jnp.asarray(rng.standard_normal((8, 8), dtype=np.float32))}}
    lora = jlora.init_lora(jax.random.key(0), params, rank=4, alpha=4, targets=["q_proj"])
    merged = jlora.merge_lora(params, lora)
    np.testing.assert_allclose(
        np.asarray(merged["q_proj"]["kernel"]), np.asarray(params["q_proj"]["kernel"]), atol=0
    )


def test_ema_warmup_then_decay():
    p0 = {"w": jnp.ones((3,))}
    ema = jema.ema_init({"w": jnp.zeros((3,))})
    # warmup: copy-through
    ema = jema.ema_update(ema, p0, step=0, start_ema=2, beta=0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.0)
    # past warmup: ema = b*ema + (1-b)*p
    p1 = {"w": jnp.full((3,), 2.0)}
    ema = jema.ema_update(ema, p1, step=5, start_ema=2, beta=0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.9 * 1.0 + 0.1 * 2.0, rtol=1e-6)
