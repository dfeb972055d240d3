"""FID: Fréchet math vs closed forms, Inception blocks vs torch-functional
oracles, full-tower shapes, and the torch-state-dict loading path."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from stable_diffusion_tpu import fid as fid_m
from stable_diffusion_tpu.models import inception as inc


# ---------------------------------------------------------------------------
# Fréchet distance math
# ---------------------------------------------------------------------------


def test_frechet_identical_is_zero(rng):
    f = rng.standard_normal((64, 16))
    mu, s = fid_m.feature_stats(f)
    assert fid_m.frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-8)


def test_frechet_1d_closed_form():
    # 1-D Gaussians: FID = (m1-m2)^2 + s1 + s2 - 2 sqrt(s1 s2)
    got = fid_m.frechet_distance([1.0], [[4.0]], [3.0], [[9.0]])
    want = (1 - 3) ** 2 + 4 + 9 - 2 * np.sqrt(36.0)
    assert got == pytest.approx(want, rel=1e-10)


def test_frechet_vs_eigen_identity(rng):
    """Tr((S1 S2)^{1/2}) equals the sum of sqrt-eigenvalues of S1 @ S2 —
    an independent check of the sqrtm-based implementation."""
    a = rng.standard_normal((32, 8))
    b = rng.standard_normal((32, 8))
    mu1, s1 = fid_m.feature_stats(a)
    mu2, s2 = fid_m.feature_stats(b)
    got = fid_m.frechet_distance(mu1, s1, mu2, s2)
    eig = np.linalg.eigvals(s1 @ s2)
    tr_sqrt = np.sqrt(np.abs(eig)).sum()
    diff = mu1 - mu2
    want = diff @ diff + np.trace(s1) + np.trace(s2) - 2 * tr_sqrt
    assert got == pytest.approx(want, rel=1e-6)


def test_fid_sensitivity(rng):
    base = rng.standard_normal((128, 32))
    close = base + 0.01 * rng.standard_normal((128, 32))
    far = base + 2.0 + rng.standard_normal((128, 32))
    assert fid_m.fid_from_features(base, close) < fid_m.fid_from_features(base, far)


# ---------------------------------------------------------------------------
# Inception blocks vs torch-functional oracles
# ---------------------------------------------------------------------------


def _torch_basic_conv(p, x_t, stride, pad):
    w = torch.from_numpy(np.transpose(np.asarray(p["conv"]["kernel"]), (3, 2, 0, 1)))
    y = F.conv2d(x_t, w, stride=stride, padding=pad)
    bn = p["bn"]
    y = F.batch_norm(
        y,
        torch.from_numpy(np.asarray(bn["running_mean"])),
        torch.from_numpy(np.asarray(bn["running_var"])),
        torch.from_numpy(np.asarray(bn["scale"])),
        torch.from_numpy(np.asarray(bn["bias"])),
        training=False, eps=inc.BN_EPS,
    )
    return F.relu(y)


def test_basic_conv_parity(rng):
    spec = (8, 16, (3, 3), 2, (1, 1))
    key = jax.random.key(0)
    p = {
        "conv": {"kernel": jax.random.normal(key, (3, 3, 8, 16)) * 0.1},
        "bn": {
            "scale": jnp.asarray(rng.standard_normal(16), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(16), jnp.float32),
            "running_mean": jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32),
            "running_var": jnp.asarray(rng.random(16) + 0.5, jnp.float32),
        },
    }
    x = rng.standard_normal((2, 11, 11, 8)).astype(np.float32)
    got = np.asarray(inc._basic_conv(p, jnp.asarray(x), spec))
    want = _torch_basic_conv(p, torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 1)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_avg_pool_count_include_pad(rng):
    x = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for cip in (True, False):
        got = np.asarray(inc._avg_pool_3x3_s1_p1(jnp.asarray(x), count_include_pad=cip))
        want = F.avg_pool2d(x_t, 3, stride=1, padding=1, count_include_pad=cip)
        np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_inception_a_block_parity(rng):
    """Mixed_5b (InceptionA) vs a torch-functional replica: all four
    branches + concat, fid_variant avg-pool semantics."""
    spec = inc.SPEC["Mixed_5b"]
    params = inc.init_inception(jax.random.key(1))["Mixed_5b"]
    # give the BN buffers non-trivial values
    for sub in params.values():
        n = sub["bn"]["scale"].shape[0]
        sub["bn"]["running_mean"] = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
        sub["bn"]["running_var"] = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
        sub["bn"]["bias"] = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    x = rng.standard_normal((1, 9, 9, 192)).astype(np.float32)
    got = np.asarray(inc._block_a(params, jnp.asarray(x), spec, fid_variant=True))

    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2))

    def run(name, inp):
        _, _, (kh, kw), stride, (ph, pw) = spec[name]
        return _torch_basic_conv(params[name], inp, stride, (ph, pw))

    b1 = run("branch1x1", x_t)
    b5 = run("branch5x5_2", run("branch5x5_1", x_t))
    b3 = run("branch3x3dbl_3", run("branch3x3dbl_2", run("branch3x3dbl_1", x_t)))
    bp = run("branch_pool", F.avg_pool2d(x_t, 3, 1, 1, count_include_pad=False))
    want = torch.cat([b1, b5, b3, bp], dim=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert got.shape[-1] == 256


def test_full_tower_shapes_and_loading(rng):
    """init -> full forward (299^2) -> (B, 2048); then the same params
    round-tripped through a torch-style flat state dict reproduce the
    output exactly (load_inception_params key mapping)."""
    params = inc.init_inception(jax.random.key(2))
    imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
    feats = np.asarray(inc.pool3_features(params, jnp.asarray(imgs)))
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(feats))

    # build the torch-layout state dict from the param tree (OIHW weights)
    import io

    from stable_diffusion_tpu.utils.torch_interop import flatten_tree

    sd = {}
    for path, leaf in flatten_tree(params).items():
        arr = np.asarray(leaf)
        if path.endswith("conv.kernel"):
            sd[path.replace("conv.kernel", "conv.weight")] = torch.from_numpy(
                arr.transpose(3, 2, 0, 1).copy()
            )
        elif path.endswith("bn.scale"):
            sd[path.replace("bn.scale", "bn.weight")] = torch.from_numpy(arr.copy())
        else:
            sd[path] = torch.from_numpy(arr.copy())
    sd["fc.weight"] = torch.zeros((1000, 2048))  # dropped by the loader
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    buf = io.BytesIO()
    torch.save(sd, buf)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "inception.pth")
        with open(pth, "wb") as f:
            f.write(buf.getvalue())
        loaded = inc.load_inception_params(pth)
    feats2 = np.asarray(inc.pool3_features(loaded, jnp.asarray(imgs)))
    np.testing.assert_allclose(feats2, feats, atol=1e-6)


def test_make_feature_fn_unknown():
    with pytest.raises(ValueError):
        fid_m.make_feature_fn("nope")
