"""Parity of core layers vs torch (NHWC/HWIO vs the reference's NCHW/OIHW)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from stable_diffusion_tpu.models import layers
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_linear(rng):
    m = nn.Linear(16, 24)
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(layers.linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_same(rng):
    m = nn.Conv2d(3, 8, 3, padding=1)
    x = rng.standard_normal((2, 3, 9, 9), dtype=np.float32)
    want = to_nhwc(m(torch.from_numpy(x)).detach().numpy())
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(layers.conv2d(p, jnp.asarray(to_nhwc(x)), padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_stride2(rng):
    m = nn.Conv2d(4, 4, 3, stride=2, padding=1)
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    want = to_nhwc(m(torch.from_numpy(x)).detach().numpy())
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(layers.conv2d(p, jnp.asarray(to_nhwc(x)), stride=2, padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_asymmetric_pad(rng):
    # the VAE downsample: pad (0,1,0,1) + stride-2 VALID (reference vae.py:20-29)
    m = nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = rng.standard_normal((1, 4, 8, 8), dtype=np.float32)
    xt = torch.nn.functional.pad(torch.from_numpy(x), (0, 1, 0, 1))
    want = to_nhwc(m(xt).detach().numpy())
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(
        layers.conv2d(p, jnp.asarray(to_nhwc(x)), stride=2, padding=((0, 1), (0, 1)))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_group_norm(rng):
    m = nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        m.weight.normal_()
        m.bias.normal_()
    x = rng.standard_normal((2, 16, 5, 5), dtype=np.float32)
    want = to_nhwc(m(torch.from_numpy(x)).detach().numpy())
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(layers.group_norm(p, jnp.asarray(to_nhwc(x)), num_groups=4, eps=1e-6))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layer_norm(rng):
    m = nn.LayerNorm(32)
    with torch.no_grad():
        m.weight.normal_()
        m.bias.normal_()
    x = rng.standard_normal((2, 7, 32), dtype=np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(layers.layer_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_activations(rng):
    x = rng.standard_normal((4, 33), dtype=np.float32)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(layers.quick_gelu(jnp.asarray(x))),
        (xt * torch.sigmoid(1.702 * xt)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(layers.gelu(jnp.asarray(x))),
        torch.nn.functional.gelu(xt).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(layers.silu(jnp.asarray(x))),
        torch.nn.functional.silu(xt).numpy(),
        atol=1e-6,
    )


def test_geglu(rng):
    from tests import ref

    act = ref.load("models.activation_fn")
    m = act.GeGLU(12, 20)
    x = rng.standard_normal((2, 3, 12), dtype=np.float32)
    want = m(torch.from_numpy(x)).detach().numpy()
    p = from_torch_state_dict(m.state_dict())
    got = np.asarray(layers.geglu(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample_nearest(rng):
    x = rng.standard_normal((1, 3, 4, 5), dtype=np.float32)
    want = to_nhwc(
        torch.nn.functional.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    )
    got = np.asarray(layers.upsample_nearest_2x(jnp.asarray(to_nhwc(x))))
    np.testing.assert_allclose(got, want, atol=0)


def test_conv2d_stride2_im2col_matches_xla():
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 32, 24)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 24, 48)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((48,)), jnp.float32)
    got = layers.conv2d({"kernel": k, "bias": b}, x, stride=2, padding=1)
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # gradients flow through the im2col lowering
    g = jax.grad(lambda xx: jnp.sum(layers.conv2d(
        {"kernel": k, "bias": b}, xx, stride=2, padding=1) ** 2))(x)
    gw = jax.grad(lambda xx: jnp.sum((jax.lax.conv_general_dilated(
        xx, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=1e-4, atol=1e-4)
