"""Parity of functional MHA vs reference MultiheadSelfAttention
(models/unet/attention.py:12-100)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from stable_diffusion_tpu.models.attention import multihead_attention
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict
from tests import ref


def make_ref_attn(num_heads, embed_dim, cond_dim=None, qkv_bias=True):
    attn_mod = ref.load("models.unet.attention")
    torch.manual_seed(0)
    return attn_mod.MultiheadSelfAttention(
        num_heads=num_heads, embedding_dim=embed_dim, cond_dim=cond_dim, qkv_bias=qkv_bias
    )


def test_self_attention(rng):
    m = make_ref_attn(4, 32)
    x = rng.standard_normal((2, 10, 32), dtype=np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(multihead_attention(p, jnp.asarray(x), num_heads=4, impl="xla"))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_causal_self_attention(rng):
    m = make_ref_attn(4, 32)
    x = rng.standard_normal((2, 9, 32), dtype=np.float32)
    want = m(torch.from_numpy(x), lookahead_mask=True).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(
        multihead_attention(p, jnp.asarray(x), num_heads=4, causal=True, impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cross_attention(rng):
    m = make_ref_attn(2, 16, cond_dim=24, qkv_bias=False)
    x = rng.standard_normal((2, 12, 16), dtype=np.float32)
    cond = rng.standard_normal((2, 7, 24), dtype=np.float32)
    want = m(torch.from_numpy(x), cond=torch.from_numpy(cond)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(
        multihead_attention(p, jnp.asarray(x), num_heads=2, cond=jnp.asarray(cond), impl="xla")
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flash_kernel_interpret_matches_xla(rng):
    """Pallas flash attention in interpreter mode vs the XLA path."""
    import jax
    from stable_diffusion_tpu.ops import flash_attention as fa
    from stable_diffusion_tpu.ops.attention import _xla_sdpa

    q = jnp.asarray(rng.standard_normal((2, 256, 2, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 256, 2, 64), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 256, 2, 64), dtype=np.float32))
    assert fa.supported(q, k)
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fa.flash_attention(q, k, v))
    want = np.asarray(_xla_sdpa(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_groupnorm_kernel_interpret_matches_xla(rng):
    """Fused GN+SiLU Pallas kernel vs the reference XLA path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from stable_diffusion_tpu.models import layers
    from stable_diffusion_tpu.ops.groupnorm import group_norm_silu

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64), dtype=np.float32))
    params = {
        "scale": jnp.asarray(rng.standard_normal(64, dtype=np.float32)),
        "bias": jnp.asarray(rng.standard_normal(64, dtype=np.float32)),
    }
    want = layers.silu(layers.group_norm(params, x, num_groups=8, eps=1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu(x=x, params=params, num_groups=8, eps=1e-5, silu=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    want2 = layers.group_norm(params, x, num_groups=8, eps=1e-5)
    with pltpu.force_tpu_interpret_mode():
        got2 = group_norm_silu(x=x, params=params, num_groups=8, eps=1e-5, silu=False, impl="pallas")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-5)


def test_flash_cross_kernel_interpret_matches_xla(rng):
    """Short-KV cross-attention kernel (77-token text conditioning, padded
    to 128 kv rows with masking) vs the XLA path, incl. head-dim padding."""
    from jax.experimental.pallas import tpu as pltpu

    from stable_diffusion_tpu.ops import flash_attention as fa
    from stable_diffusion_tpu.ops.attention import _xla_sdpa

    for d in (64, 40):  # lane-aligned and padded head dims
        q = jnp.asarray(rng.standard_normal((2, 256, 2, d), dtype=np.float32))
        k = jnp.asarray(rng.standard_normal((2, 77, 2, d), dtype=np.float32))
        v = jnp.asarray(rng.standard_normal((2, 77, 2, d), dtype=np.float32))
        assert fa.cross_supported(q, k)
        assert not fa.supported(q, k)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fa.flash_cross_attention(q, k, v))
        want = np.asarray(_xla_sdpa(q, k, v))
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_sdpa_routes_cross_to_kernel(rng, monkeypatch):
    """impl='flash' on a cross shape must call the cross kernel."""
    from stable_diffusion_tpu.ops import attention as A
    from stable_diffusion_tpu.ops import flash_attention as fa
    from jax.experimental.pallas import tpu as pltpu

    q = jnp.asarray(rng.standard_normal((1, 128, 2, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 77, 2, 64), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 77, 2, 64), dtype=np.float32))
    calls = []
    real = fa.flash_cross_attention
    monkeypatch.setattr(fa, "flash_cross_attention",
                        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])
    with pltpu.force_tpu_interpret_mode():
        out = A.sdpa(q, k, v, impl="flash")
    assert calls, "cross shape did not route to flash_cross_attention"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(A._xla_sdpa(q, k, v)), atol=2e-5
    )


def test_premerged_self_attention_matches_xla(rng):
    """Weight-padded premerged path (kernel layout, d=40-style padding) ==
    the XLA path, interpret mode."""
    from jax.experimental.pallas import tpu as pltpu
    from stable_diffusion_tpu.models.attention import (
        init_multihead_attention, multihead_attention)

    e, heads = 320, 8  # d = 40 -> dp = 64 (the SD1.5 stage-0 shape)
    p = init_multihead_attention(jax.random.key(0), e, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 128, e)), jnp.float32)
    want = np.asarray(multihead_attention(p, x, num_heads=heads, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(multihead_attention(p, x, num_heads=heads, impl="flash"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_premerged_cross_attention_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu
    from stable_diffusion_tpu.models.attention import (
        init_multihead_attention, multihead_attention)

    e, heads, cd = 320, 8, 96
    p = init_multihead_attention(jax.random.key(1), e, cond_dim=cd, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 128, e)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((2, 77, cd)), jnp.float32)
    want = np.asarray(multihead_attention(p, x, num_heads=heads, cond=cond, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            multihead_attention(p, x, num_heads=heads, cond=cond, impl="flash"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_premerged_grad_flows(rng):
    """The premerged custom-VJP recompute path produces XLA-matching grads."""
    from jax.experimental.pallas import tpu as pltpu
    from stable_diffusion_tpu.models.attention import (
        init_multihead_attention, multihead_attention)

    e, heads = 64, 2  # d = 32 -> dp = 64 padding in the VJP path too
    p = init_multihead_attention(jax.random.key(2), e, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 128, e)), jnp.float32)

    def loss_flash(x):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(multihead_attention(p, x, num_heads=heads, impl="flash") ** 2)

    def loss_xla(x):
        return jnp.sum(multihead_attention(p, x, num_heads=heads, impl="xla") ** 2)

    g1 = np.asarray(jax.grad(loss_flash)(x))
    g2 = np.asarray(jax.grad(loss_xla)(x))
    np.testing.assert_allclose(g1, g2, atol=5e-4, rtol=1e-3)


def test_premerged_w8a8_matches_dequantized(rng):
    """The int8 premerged path ~= running the same dequantized weights."""
    from jax.experimental.pallas import tpu as pltpu
    from stable_diffusion_tpu.models.attention import (
        init_multihead_attention, multihead_attention)
    from stable_diffusion_tpu.utils.quantize_model import (
        attach_act_scales, quantize_params)

    e, heads = 320, 8
    p = init_multihead_attention(jax.random.key(3), e, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 128, e)) * 0.5, jnp.float32)
    pq = attach_act_scales(quantize_params(p), scale=4.0)
    # oracle: the established (non-premerged) W8A8 path — same quantizer,
    # so the premerged layout must reproduce it numerically
    want = np.asarray(multihead_attention(pq, x, num_heads=heads, impl="xla"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(multihead_attention(pq, x, num_heads=heads, impl="flash"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_flash_bwd_matches_xla_vjp(rng):
    """The two-pass fused flash backward (ops/flash_attention.py pass A/B)
    reproduces the XLA recompute VJP's dq/dk/dv (interpret mode, f32).

    Replaces the reference's reliance on the flash_attn CUDA wheel's fused
    backward (reference models/unet/attention.py:52-67) with a TPU kernel."""
    from jax.experimental.pallas import tpu as pltpu
    from stable_diffusion_tpu.ops import flash_attention as fa

    b, s, heads, dp = 1, 512, 2, 64
    w = heads * dp
    assert fa.bwd_premerged_supported(b, s, w, 4)
    scale = dp ** -0.5
    q = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, s, w)) * 0.3, jnp.float32)

    o, vjp = jax.vjp(
        lambda q_, k_, v_: fa._xla_ref_premerged(q_, k_, v_, scale, heads, dp),
        q, k, v,
    )
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = fa._premerged_flash_bwd(q, k, v, o, g, scale, heads, dp)
    for name, a, bb in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-4, rtol=1e-3, err_msg=name
        )
