"""FULL-SIZE numerical parity vs the PyTorch reference (slow, CPU, f32).

The other parity tests use tiny configs; these load shared random weights
into BOTH the reference torch models at their REAL SD1.5 topologies and ours
(via utils/torch_interop), and assert forward MSE — so the 1280-channel /
8-head / 4096-token code paths are oracle-verified, not just trace-verified.
Mirrors the reference's own full-size golden strategy (unit_test.py:84-112,
which demands MSE == 0 vs diffusers; across frameworks we assert MSE < 1e-4).

  * UNet: reference models/unet/unet.py:431-443, default ctor == SD1.5
    (block_out_channels [320,640,1280,1280], 8 heads, cross 768), forward at
    (1, 4, 64, 64).
  * VAE: reference models/vae/vae.py:251-274, encode (explicit noise path)
    + decode at 256x256 (full channel widths; spatial size is a runtime
    parameter, not topology).
  * ViT-L text tower: reference models/clip/clip.py:8-34 at its real
    12x768 config over 77 tokens.

Marked ``slow``: the three torch models total ~1.3 GB of f32 weights and the
forwards run minutes on this single-core box.  Deselect with -m "not slow".
"""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from stable_diffusion_tpu.models import clip as jclip
from stable_diffusion_tpu.models import unet as junet
from stable_diffusion_tpu.models import vae as jvae
from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict
from tests import ref

pytestmark = pytest.mark.slow


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _mse(a, b):
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def test_fullsize_unet_sd15_forward(rng):
    un = ref.load("models.unet.unet")
    torch.manual_seed(0)
    m = un.UNet()  # defaults are exactly SD1.5 (unet.py:354-363)
    m.eval()
    x = rng.standard_normal((1, 4, 64, 64), dtype=np.float32)
    t = np.array([999], dtype=np.int64)
    cond = rng.standard_normal((1, 77, 768), dtype=np.float32)
    with torch.no_grad():
        want = to_nhwc(
            m(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)).numpy()
        )
    p = from_torch_state_dict(m.state_dict())
    del m
    cfg = junet.UNetConfig.sd15()
    got = np.asarray(
        junet.unet_apply(
            p, jnp.asarray(to_nhwc(x)), jnp.asarray(t), jnp.asarray(cond), cfg,
            impl="xla",
        )
    )
    assert got.shape == want.shape
    mse = _mse(got, want)
    assert mse < 1e-4, f"full-size UNet forward MSE {mse}"
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_fullsize_vae_encode_decode(rng):
    va = ref.load("models.vae.vae")
    torch.manual_seed(0)
    m = va.VAE()
    m.eval()
    x = rng.standard_normal((1, 3, 256, 256), dtype=np.float32)
    noise = rng.standard_normal((1, 4, 32, 32), dtype=np.float32)
    with torch.no_grad():
        lat, _, _ = m.encode(torch.from_numpy(x), noise=torch.from_numpy(noise))
        img = m.decode(lat * 0.18215)  # decode expects the scaled convention
    want_lat = to_nhwc(lat.numpy())
    want_img = to_nhwc(img.numpy())
    p = from_torch_state_dict(m.state_dict())
    del m
    cfg = jvae.VAEConfig()
    got_lat, _, _ = jvae.encode(
        p, jnp.asarray(to_nhwc(x)), cfg, noise=jnp.asarray(to_nhwc(noise)), impl="xla"
    )
    got_img = np.asarray(
        jvae.decode(p, jnp.asarray(got_lat) * 0.18215, cfg, impl="xla")
    )
    lat_mse = _mse(got_lat, want_lat)
    img_mse = _mse(got_img, want_img)
    assert lat_mse < 1e-4, f"full-size VAE encode MSE {lat_mse}"
    assert img_mse < 1e-4, f"full-size VAE decode MSE {img_mse}"


def test_fullsize_vit_l_text_tower(rng):
    cl = ref.load("models.clip.clip")
    torch.manual_seed(0)
    m = cl.TextEncoder()  # real ViT-L: 12 layers, 768 wide, QuickGELU
    m.eval()
    ids = rng.integers(0, 49408, size=(2, 77))
    with torch.no_grad():
        want = m(torch.from_numpy(ids)).numpy()
    p = from_torch_state_dict(m.state_dict())
    del m
    cfg = jclip.CLIPTextConfig.vit_l()
    got = np.asarray(
        jclip.text_encoder_v1_apply(p, jnp.asarray(ids), cfg, impl="xla")
    )
    mse = _mse(got, want)
    assert mse < 1e-4, f"full-size ViT-L forward MSE {mse}"
    np.testing.assert_allclose(got, want, atol=2e-3)
