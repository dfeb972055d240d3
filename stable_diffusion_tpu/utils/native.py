"""ctypes bindings for the native (C++) input-pipeline kernels.

Builds native/libimage_ops.so on first use (g++ is in the image; pybind11 is
not, so bindings are plain ctypes — see native/image_ops.cpp).  Every entry
point has a numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimage_ops.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.resize_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.scale_img_inplace.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize_batch(images: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(N, H, W, C) uint8 -> (N, out_h, out_w, C) float32 in [-1, 1].

    Native bilinear (half-pixel centers); numpy fallback uses the same math.
    """
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    lib = _load()
    out = np.empty((n, out_h, out_w, c), dtype=np.float32)
    if lib is not None:
        lib.resize_normalize_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_h, out_w,
        )
        return out
    # numpy fallback (same half-pixel bilinear)
    fy = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int32), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int32), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    dy = (fy - y0).astype(np.float32)[None, :, None, None]
    dx = (fx - x0).astype(np.float32)[None, None, :, None]
    im = images.astype(np.float32)
    v00 = im[:, y0][:, :, x0]
    v01 = im[:, y0][:, :, x1]
    v10 = im[:, y1][:, :, x0]
    v11 = im[:, y1][:, :, x1]
    top = v00 + (v01 - v00) * dx
    bot = v10 + (v11 - v10) * dx
    out[:] = (top + (bot - top) * dy) / 127.5 - 1.0
    return out


def scale_img_inplace(data: np.ndarray, old_range, new_range, clamp: bool = False) -> np.ndarray:
    data = np.ascontiguousarray(data, dtype=np.float32)
    lib = _load()
    if lib is not None:
        lib.scale_img_inplace(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), data.size,
            float(old_range[0]), float(old_range[1]),
            float(new_range[0]), float(new_range[1]), int(clamp),
        )
        return data
    k = (new_range[1] - new_range[0]) / (old_range[1] - old_range[0])
    data[:] = (data - old_range[0]) * k + new_range[0]
    if clamp:
        np.clip(data, new_range[0], new_range[1], out=data)
    return data
