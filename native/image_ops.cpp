// Native image preprocessing for the data layer.
//
// The reference's input pipeline is torchvision transforms (Resize-bilinear +
// ToTensor + Normalize, utils/datasets.py:78-82).  This library provides the
// same pixel math as a self-contained C++ kernel so the host-side input
// pipeline (the one part of this framework that is NOT TPU compute) doesn't
// bottleneck training on Python: bilinear resize + [-1,1] normalization and
// a batched entry point that processes N images in one call (OpenMP when
// available; benign single-threaded otherwise).
//
// Exposed via ctypes (see stable_diffusion_tpu/utils/native.py).  Output is
// NHWC float32 — the TPU-native layout this framework uses everywhere.

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear sample of channel c at continuous coords (fy, fx).
static inline float sample_bilinear(const uint8_t* src, int h, int w, int ch,
                                    float fy, float fx, int c) {
  int y0 = static_cast<int>(fy);
  int x0 = static_cast<int>(fx);
  y0 = std::min(std::max(y0, 0), h - 1);
  x0 = std::min(std::max(x0, 0), w - 1);
  int y1 = std::min(y0 + 1, h - 1);
  int x1 = std::min(x0 + 1, w - 1);
  float dy = fy - static_cast<float>(y0);
  float dx = fx - static_cast<float>(x0);

  const float v00 = src[(y0 * w + x0) * ch + c];
  const float v01 = src[(y0 * w + x1) * ch + c];
  const float v10 = src[(y1 * w + x0) * ch + c];
  const float v11 = src[(y1 * w + x1) * ch + c];
  const float top = v00 + (v01 - v00) * dx;
  const float bot = v10 + (v11 - v10) * dx;
  return top + (bot - top) * dy;
}

// uint8 HWC -> float32 out_h x out_w x C in [-1, 1].
void resize_normalize(const uint8_t* src, int h, int w, int ch,
                      float* dst, int out_h, int out_w) {
  const float sy = static_cast<float>(h) / static_cast<float>(out_h);
  const float sx = static_cast<float>(w) / static_cast<float>(out_w);
  for (int oy = 0; oy < out_h; ++oy) {
    const float fy = (static_cast<float>(oy) + 0.5f) * sy - 0.5f;
    for (int ox = 0; ox < out_w; ++ox) {
      const float fx = (static_cast<float>(ox) + 0.5f) * sx - 0.5f;
      float* out = dst + (static_cast<long>(oy) * out_w + ox) * ch;
      for (int c = 0; c < ch; ++c) {
        const float v = sample_bilinear(src, h, w, ch, fy, fx, c);
        out[c] = v * (1.0f / 127.5f) - 1.0f;  // [0,255] -> [-1,1]
      }
    }
  }
}

// Batched: N same-sized uint8 images -> (N, out_h, out_w, C) float32.
void resize_normalize_batch(const uint8_t* src, int n, int h, int w, int ch,
                            float* dst, int out_h, int out_w) {
  const long in_stride = static_cast<long>(h) * w * ch;
  const long out_stride = static_cast<long>(out_h) * out_w * ch;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    resize_normalize(src + i * in_stride, h, w, ch, dst + i * out_stride,
                     out_h, out_w);
  }
}

// Linear rescale with optional clamp (the reference's scale_img,
// utils/datasets.py:15-23) over a float32 buffer, in place.
void scale_img_inplace(float* data, long n, float old_min, float old_max,
                       float new_min, float new_max, int clamp) {
  const float k = (new_max - new_min) / (old_max - old_min);
  for (long i = 0; i < n; ++i) {
    float v = (data[i] - old_min) * k + new_min;
    if (clamp) v = std::min(std::max(v, new_min), new_max);
    data[i] = v;
  }
}

}  // extern "C"
