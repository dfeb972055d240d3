"""Native C++ input-pipeline kernels: build, bind, and match the numpy path."""

import numpy as np
import pytest

from stable_diffusion_tpu.utils import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of native/libimage_ops.so failed"


def test_resize_normalize_matches_numpy(rng):
    imgs = (rng.random((3, 37, 53, 3)) * 255).astype(np.uint8)
    got = native.resize_normalize_batch(imgs, 16, 24)
    # force the numpy fallback for comparison
    lib, native._lib = native._lib, None
    tried = native._tried
    native._tried = True
    want = native.resize_normalize_batch(imgs, 16, 24)
    native._lib, native._tried = lib, tried
    assert got.shape == (3, 16, 24, 3)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_scale_img_inplace(rng):
    x = rng.random((100,)).astype(np.float32) * 255
    got = native.scale_img_inplace(x.copy(), (0, 255), (0, 1), clamp=True)
    np.testing.assert_allclose(got, np.clip(x / 255.0, 0, 1), atol=1e-6)
