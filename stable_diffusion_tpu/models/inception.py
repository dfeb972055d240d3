"""InceptionV3 pool3 feature extractor for FID — functional JAX, NHWC.

The reference computes FID via ``torchmetrics.image.fid`` (commented out,
reference evaluation.py:21-31, 96-107), which wraps the standard pytorch-fid
InceptionV3 (TF-ported "pt_inception-2015-12-05" weights).  This is a
TPU-native re-implementation of that tower: torchvision's InceptionV3 layer
graph with the pytorch-fid deviations switchable via ``fid_variant``:

  * avg-pools inside Inception blocks use count_include_pad=False,
  * Mixed_7c's branch_pool uses a MAX pool instead of avg.

Weights load from any torchvision/pytorch-fid state_dict (``.pth`` via
torch, or safetensors) through ``load_inception_params`` — the param tree
mirrors the torch module names exactly, so ``from_torch_state_dict`` ingests
it mechanically (conv OIHW->HWIO).  ``init_inception`` builds random params
with the real shapes for shape/pipeline tests.

Input contract (matches pytorch-fid): float images in [0, 1], any HxW;
``pool3_features`` resizes to 299x299 bilinear (antialias off, like
``F.interpolate``), maps to [-1, 1], and returns (B, 2048) pool3 features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3

# Every BasicConv2d in the tower: name -> (cin, cout, (kh, kw), stride, (ph, pw))
_STEM = {
    "Conv2d_1a_3x3": (3, 32, (3, 3), 2, (0, 0)),
    "Conv2d_2a_3x3": (32, 32, (3, 3), 1, (0, 0)),
    "Conv2d_2b_3x3": (32, 64, (3, 3), 1, (1, 1)),
    "Conv2d_3b_1x1": (64, 80, (1, 1), 1, (0, 0)),
    "Conv2d_4a_3x3": (80, 192, (3, 3), 1, (0, 0)),
}


def _inception_a(cin, pool_features):
    return {
        "branch1x1": (cin, 64, (1, 1), 1, (0, 0)),
        "branch5x5_1": (cin, 48, (1, 1), 1, (0, 0)),
        "branch5x5_2": (48, 64, (5, 5), 1, (2, 2)),
        "branch3x3dbl_1": (cin, 64, (1, 1), 1, (0, 0)),
        "branch3x3dbl_2": (64, 96, (3, 3), 1, (1, 1)),
        "branch3x3dbl_3": (96, 96, (3, 3), 1, (1, 1)),
        "branch_pool": (cin, pool_features, (1, 1), 1, (0, 0)),
    }


def _inception_b(cin):
    return {
        "branch3x3": (cin, 384, (3, 3), 2, (0, 0)),
        "branch3x3dbl_1": (cin, 64, (1, 1), 1, (0, 0)),
        "branch3x3dbl_2": (64, 96, (3, 3), 1, (1, 1)),
        "branch3x3dbl_3": (96, 96, (3, 3), 2, (0, 0)),
    }


def _inception_c(cin, c7):
    return {
        "branch1x1": (cin, 192, (1, 1), 1, (0, 0)),
        "branch7x7_1": (cin, c7, (1, 1), 1, (0, 0)),
        "branch7x7_2": (c7, c7, (1, 7), 1, (0, 3)),
        "branch7x7_3": (c7, 192, (7, 1), 1, (3, 0)),
        "branch7x7dbl_1": (cin, c7, (1, 1), 1, (0, 0)),
        "branch7x7dbl_2": (c7, c7, (7, 1), 1, (3, 0)),
        "branch7x7dbl_3": (c7, c7, (1, 7), 1, (0, 3)),
        "branch7x7dbl_4": (c7, c7, (7, 1), 1, (3, 0)),
        "branch7x7dbl_5": (c7, 192, (1, 7), 1, (0, 3)),
        "branch_pool": (cin, 192, (1, 1), 1, (0, 0)),
    }


def _inception_d(cin):
    return {
        "branch3x3_1": (cin, 192, (1, 1), 1, (0, 0)),
        "branch3x3_2": (192, 320, (3, 3), 2, (0, 0)),
        "branch7x7x3_1": (cin, 192, (1, 1), 1, (0, 0)),
        "branch7x7x3_2": (192, 192, (1, 7), 1, (0, 3)),
        "branch7x7x3_3": (192, 192, (7, 1), 1, (3, 0)),
        "branch7x7x3_4": (192, 192, (3, 3), 2, (0, 0)),
    }


def _inception_e(cin):
    return {
        "branch1x1": (cin, 320, (1, 1), 1, (0, 0)),
        "branch3x3_1": (cin, 384, (1, 1), 1, (0, 0)),
        "branch3x3_2a": (384, 384, (1, 3), 1, (0, 1)),
        "branch3x3_2b": (384, 384, (3, 1), 1, (1, 0)),
        "branch3x3dbl_1": (cin, 448, (1, 1), 1, (0, 0)),
        "branch3x3dbl_2": (448, 384, (3, 3), 1, (1, 1)),
        "branch3x3dbl_3a": (384, 384, (1, 3), 1, (0, 1)),
        "branch3x3dbl_3b": (384, 384, (3, 1), 1, (1, 0)),
        "branch_pool": (cin, 192, (1, 1), 1, (0, 0)),
    }


SPEC = {
    **_STEM,
    "Mixed_5b": _inception_a(192, 32),
    "Mixed_5c": _inception_a(256, 64),
    "Mixed_5d": _inception_a(288, 64),
    "Mixed_6a": _inception_b(288),
    "Mixed_6b": _inception_c(768, 128),
    "Mixed_6c": _inception_c(768, 160),
    "Mixed_6d": _inception_c(768, 160),
    "Mixed_6e": _inception_c(768, 192),
    "Mixed_7a": _inception_d(768),
    "Mixed_7b": _inception_e(1280),
    "Mixed_7c": _inception_e(2048),
}


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _basic_conv(p, x, spec):
    """BasicConv2d: conv(bias=False) -> BN(eps=1e-3, inference) -> ReLU."""
    _, _, (kh, kw), stride, (ph, pw) = spec
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["running_var"].astype(x.dtype) + BN_EPS)
    y = (y - bn["running_mean"].astype(x.dtype)) * inv * bn["scale"].astype(x.dtype) \
        + bn["bias"].astype(x.dtype)
    return jax.nn.relu(y)


def _max_pool(x, k=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _avg_pool_3x3_s1_p1(x, count_include_pad: bool):
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    if count_include_pad:
        return sums / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return sums / counts


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _run_chain(params, x, spec, names):
    for n in names:
        x = _basic_conv(params[n], x, spec[n])
    return x


def _block_a(p, x, spec, fid_variant):
    b1 = _basic_conv(p["branch1x1"], x, spec["branch1x1"])
    b5 = _run_chain(p, x, spec, ["branch5x5_1", "branch5x5_2"])
    b3 = _run_chain(p, x, spec, ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"])
    bp = _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_variant)
    bp = _basic_conv(p["branch_pool"], bp, spec["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(p, x, spec):
    b3 = _basic_conv(p["branch3x3"], x, spec["branch3x3"])
    bd = _run_chain(p, x, spec, ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"])
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(p, x, spec, fid_variant):
    b1 = _basic_conv(p["branch1x1"], x, spec["branch1x1"])
    b7 = _run_chain(p, x, spec, ["branch7x7_1", "branch7x7_2", "branch7x7_3"])
    bd = _run_chain(p, x, spec, [f"branch7x7dbl_{i}" for i in range(1, 6)])
    bp = _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_variant)
    bp = _basic_conv(p["branch_pool"], bp, spec["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(p, x, spec):
    b3 = _run_chain(p, x, spec, ["branch3x3_1", "branch3x3_2"])
    b7 = _run_chain(p, x, spec, [f"branch7x7x3_{i}" for i in range(1, 5)])
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(p, x, spec, fid_variant, pool_kind):
    b1 = _basic_conv(p["branch1x1"], x, spec["branch1x1"])
    b3 = _basic_conv(p["branch3x3_1"], x, spec["branch3x3_1"])
    b3 = jnp.concatenate([
        _basic_conv(p["branch3x3_2a"], b3, spec["branch3x3_2a"]),
        _basic_conv(p["branch3x3_2b"], b3, spec["branch3x3_2b"]),
    ], axis=-1)
    bd = _run_chain(p, x, spec, ["branch3x3dbl_1", "branch3x3dbl_2"])
    bd = jnp.concatenate([
        _basic_conv(p["branch3x3dbl_3a"], bd, spec["branch3x3dbl_3a"]),
        _basic_conv(p["branch3x3dbl_3b"], bd, spec["branch3x3dbl_3b"]),
    ], axis=-1)
    if pool_kind == "max":  # pytorch-fid's FIDInceptionE_2 (Mixed_7c)
        bp = _max_pool(x, k=3, stride=1, pad=1)
    else:
        bp = _avg_pool_3x3_s1_p1(x, count_include_pad=not fid_variant)
    bp = _basic_conv(p["branch_pool"], bp, spec["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# Tower
# ---------------------------------------------------------------------------


def inception_apply(params, x, *, fid_variant: bool = True) -> jax.Array:
    """(B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    for n in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"]:
        x = _basic_conv(params[n], x, SPEC[n])
    x = _max_pool(x)
    for n in ["Conv2d_3b_1x1", "Conv2d_4a_3x3"]:
        x = _basic_conv(params[n], x, SPEC[n])
    x = _max_pool(x)
    for n in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        x = _block_a(params[n], x, SPEC[n], fid_variant)
    x = _block_b(params["Mixed_6a"], x, SPEC["Mixed_6a"])
    for n in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        x = _block_c(params[n], x, SPEC[n], fid_variant)
    x = _block_d(params["Mixed_7a"], x, SPEC["Mixed_7a"])
    x = _block_e(params["Mixed_7b"], x, SPEC["Mixed_7b"], fid_variant, "avg")
    x = _block_e(params["Mixed_7c"], x, SPEC["Mixed_7c"], fid_variant,
                 "max" if fid_variant else "avg")
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


def pool3_features(params, images01, *, fid_variant: bool = True) -> jax.Array:
    """Float images in [0, 1], any (B, H, W, 3) -> (B, 2048).

    Matches pytorch-fid preprocessing: bilinear resize to 299 (no antialias,
    like F.interpolate), then scale to [-1, 1]."""
    b = images01.shape[0]
    x = jax.image.resize(images01.astype(jnp.float32), (b, 299, 299, 3), "bilinear")
    return inception_apply(params, x * 2.0 - 1.0, fid_variant=fid_variant)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _iter_convs():
    for name, spec in SPEC.items():
        if isinstance(spec, dict):
            for sub, s in spec.items():
                yield f"{name}.{sub}", s
        else:
            yield name, spec


def init_inception(key, dtype=jnp.float32):
    """Random params with the real shapes (for tests / shape checks)."""
    params = {}
    names = list(_iter_convs())
    keys = jax.random.split(key, len(names))
    for k, (path, (cin, cout, (kh, kw), _, _)) in zip(keys, names):
        node = params
        for part in path.split("."):
            node = node.setdefault(part, {})
        node["conv"] = {"kernel": jax.random.normal(k, (kh, kw, cin, cout), dtype) * 0.05}
        node["bn"] = {
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
            "running_mean": jnp.zeros((cout,), dtype),
            "running_var": jnp.ones((cout,), dtype),
        }
    return params


def load_inception_params(path: str):
    """Load a torchvision / pytorch-fid InceptionV3 state dict (.pth via
    torch, or .safetensors).  fc / AuxLogits keys are dropped (FID uses
    pool3 only)."""
    from stable_diffusion_tpu.utils.torch_interop import from_torch_state_dict

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    sd = {
        k: v for k, v in sd.items()
        if not k.startswith(("fc.", "AuxLogits.")) and "num_batches_tracked" not in k
    }
    params = from_torch_state_dict(sd)
    expected = {p for p, _ in _iter_convs()}
    got = set()
    for top, sub in params.items():
        for name in sub:
            if name in ("conv", "bn"):
                got.add(top)
            else:
                got.add(f"{top}.{name}")
    missing = expected - got
    assert not missing, f"inception state dict missing modules: {sorted(missing)[:5]}"
    return params
