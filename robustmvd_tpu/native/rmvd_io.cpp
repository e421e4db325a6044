// Native host-side image ops for the data pipeline.
//
// The TPU input pipeline is host-CPU-bound: per-sample image resizing and
// normalization dominate loader time (the reference leans on
// skimage/cv2/PIL for these, rmvd/data/transforms.py). This library
// provides the hot host kernels as vectorizable C++ — bilinear/nearest
// resizing with half-pixel centers (torch align_corners=False parity) and
// uint8->float normalization — loaded via ctypes with a numpy fallback
// (robustmvd_tpu/utils/native.py).
//
// Build: g++ -O3 -shared -fPIC -o librmvd_io.so rmvd_io.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

extern "C" {

// Bilinear resize of a (C, H, W) float32 image to (C, out_h, out_w),
// half-pixel centers, edge clamp, no antialias.
void resize_bilinear_chw_f32(const float* src, float* dst, int64_t channels,
                             int64_t in_h, int64_t in_w, int64_t out_h,
                             int64_t out_w) {
  std::vector<int64_t> x0(out_w), x1(out_w);
  std::vector<float> wx(out_w);
  const double sx = static_cast<double>(in_w) / out_w;
  for (int64_t ox = 0; ox < out_w; ++ox) {
    double x = (ox + 0.5) * sx - 0.5;
    x = std::min(std::max(x, 0.0), static_cast<double>(in_w - 1));
    int64_t xi = static_cast<int64_t>(x);
    x0[ox] = xi;
    x1[ox] = std::min(xi + 1, in_w - 1);
    wx[ox] = static_cast<float>(x - xi);
  }

  const double sy = static_cast<double>(in_h) / out_h;
  for (int64_t oy = 0; oy < out_h; ++oy) {
    double y = (oy + 0.5) * sy - 0.5;
    y = std::min(std::max(y, 0.0), static_cast<double>(in_h - 1));
    int64_t y0 = static_cast<int64_t>(y);
    int64_t y1 = std::min(y0 + 1, in_h - 1);
    float wy = static_cast<float>(y - y0);

    for (int64_t c = 0; c < channels; ++c) {
      const float* row0 = src + (c * in_h + y0) * in_w;
      const float* row1 = src + (c * in_h + y1) * in_w;
      float* out = dst + (c * out_h + oy) * out_w;
      for (int64_t ox = 0; ox < out_w; ++ox) {
        const float a = row0[x0[ox]] + wx[ox] * (row0[x1[ox]] - row0[x0[ox]]);
        const float b = row1[x0[ox]] + wx[ox] * (row1[x1[ox]] - row1[x0[ox]]);
        out[ox] = a + wy * (b - a);
      }
    }
  }
}

// Nearest resize of a (C, H, W) float32 image (half-pixel rounding).
void resize_nearest_chw_f32(const float* src, float* dst, int64_t channels,
                            int64_t in_h, int64_t in_w, int64_t out_h,
                            int64_t out_w) {
  std::vector<int64_t> xs(out_w);
  const double sx = static_cast<double>(in_w) / out_w;
  for (int64_t ox = 0; ox < out_w; ++ox) {
    int64_t xi = static_cast<int64_t>(std::nearbyint((ox + 0.5) * sx - 0.5));
    xs[ox] = std::min(std::max<int64_t>(xi, 0), in_w - 1);
  }
  const double sy = static_cast<double>(in_h) / out_h;
  for (int64_t oy = 0; oy < out_h; ++oy) {
    int64_t yi = static_cast<int64_t>(std::nearbyint((oy + 0.5) * sy - 0.5));
    yi = std::min(std::max<int64_t>(yi, 0), in_h - 1);
    for (int64_t c = 0; c < channels; ++c) {
      const float* row = src + (c * in_h + yi) * in_w;
      float* out = dst + (c * out_h + oy) * out_w;
      for (int64_t ox = 0; ox < out_w; ++ox) out[ox] = row[xs[ox]];
    }
  }
}

// uint8 HWC -> float32 CHW with scale/shift: out = in * scale + shift.
void u8hwc_to_f32chw(const uint8_t* src, float* dst, int64_t h, int64_t w,
                     int64_t c, float scale, float shift) {
  for (int64_t ch = 0; ch < c; ++ch) {
    float* out = dst + ch * h * w;
    const uint8_t* in = src + ch;
    for (int64_t i = 0; i < h * w; ++i) {
      out[i] = static_cast<float>(in[i * c]) * scale + shift;
    }
  }
}

}  // extern "C"
