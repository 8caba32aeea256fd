// icd-tpu native image preprocessing.
//
// The reference's input pipeline leans on torch DataLoader worker
// processes + torchvision C++ transforms (SURVEY.md C27 "native deps");
// this library is the TPU build's equivalent: the per-sample hot path
// (resize short-side + center-crop + dtype/normalise) as vectorisable
// C++ with a thread-pooled batch API, bound to Python via ctypes
// (invertible_cd_tpu/utils/native.py).
//
// Filters: bilinear and Catmull-Rom bicubic (a = -0.5, PIL-compatible
// coefficients). Layout: HWC uint8 RGB in, HWC float32 out
// (y = x * scale + offset lets callers pick [0,1] or [-1,1]).
//
// Build: native/build.sh  (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Catmull-Rom / PIL-bicubic kernel, a = -0.5.
inline float cubic_weight(float x) {
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct FilterSpec {
  float support;  // kernel radius in source pixels (pre-scaling)
  float (*weight)(float);
};

inline float linear_weight(float x) {
  x = std::fabs(x);
  return x < 1.0f ? 1.0f - x : 0.0f;
}

// Separable resampling with kernel scaling for downscale antialiasing
// (the same strategy PIL uses: widen the kernel by the shrink factor).
void resample_axis(const float* src, int src_n, int stride_in, int lanes,
                   float* dst, int dst_n, int stride_out,
                   const FilterSpec& f) {
  const float scale = static_cast<float>(src_n) / dst_n;
  const float fscale = std::max(scale, 1.0f);
  const float support = f.support * fscale;

  std::vector<float> weights;
  for (int i = 0; i < dst_n; ++i) {
    const float center = (i + 0.5f) * scale - 0.5f;
    const int lo = std::max(0, static_cast<int>(std::floor(center - support)));
    const int hi =
        std::min(src_n - 1, static_cast<int>(std::ceil(center + support)));
    weights.clear();
    float total = 0.0f;
    for (int k = lo; k <= hi; ++k) {
      const float w = f.weight((k - center) / fscale);
      weights.push_back(w);
      total += w;
    }
    if (total == 0.0f) total = 1.0f;
    for (int lane = 0; lane < lanes; ++lane) {
      float acc = 0.0f;
      for (int k = lo; k <= hi; ++k) {
        acc += weights[k - lo] * src[k * stride_in + lane];
      }
      dst[i * stride_out + lane] = acc / total;
    }
  }
}

void resize_rgb(const uint8_t* src, int sh, int sw, float* dst, int dh, int dw,
                const FilterSpec& f) {
  // u8 -> f32
  std::vector<float> srcf(static_cast<size_t>(sh) * sw * 3);
  for (size_t i = 0; i < srcf.size(); ++i) srcf[i] = src[i];

  // horizontal pass: (sh, sw, 3) -> (sh, dw, 3)
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    resample_axis(srcf.data() + static_cast<size_t>(y) * sw * 3, sw, 3, 3,
                  tmp.data() + static_cast<size_t>(y) * dw * 3, dw, 3, f);
  }
  // vertical pass: (sh, dw, 3) -> (dh, dw, 3), column-by-column
  for (int x = 0; x < dw; ++x) {
    resample_axis(tmp.data() + static_cast<size_t>(x) * 3, sh, dw * 3, 3,
                  dst + static_cast<size_t>(x) * 3, dh, dw * 3, f);
  }
}

void prep_one(const uint8_t* src, int sh, int sw, float* dst, int out_size,
              float scale_mul, float offset, int filter) {
  const FilterSpec spec =
      filter == 1 ? FilterSpec{2.0f, cubic_weight} : FilterSpec{1.0f, linear_weight};
  // short-side resize
  const float s = static_cast<float>(out_size) / std::min(sh, sw);
  const int rh = std::max(out_size, static_cast<int>(std::lround(sh * s)));
  const int rw = std::max(out_size, static_cast<int>(std::lround(sw * s)));
  std::vector<float> resized(static_cast<size_t>(rh) * rw * 3);
  resize_rgb(src, sh, sw, resized.data(), rh, rw, spec);
  // center crop + normalise
  const int top = (rh - out_size) / 2;
  const int left = (rw - out_size) / 2;
  for (int y = 0; y < out_size; ++y) {
    const float* row = resized.data() + (static_cast<size_t>(y + top) * rw + left) * 3;
    float* out = dst + static_cast<size_t>(y) * out_size * 3;
    for (int i = 0; i < out_size * 3; ++i) {
      out[i] = clampf(row[i], 0.0f, 255.0f) * scale_mul + offset;
    }
  }
}

}  // namespace

extern "C" {

int icd_native_version() { return 1; }

// Single image: src uint8 HWC (sh, sw, 3) -> dst float32 (size, size, 3).
// filter: 0 = bilinear, 1 = bicubic.  y = x * scale + offset.
void icd_resize_crop_normalize(const uint8_t* src, int sh, int sw, float* dst,
                               int size, float scale, float offset,
                               int filter) {
  prep_one(src, sh, sw, dst, size, scale, offset, filter);
}

// Batched, thread-pooled variant. srcs: array of pointers; shapes: (n, 2)
// int32 (h, w). dst: (n, size, size, 3) float32.
void icd_resize_crop_normalize_batch(const uint8_t** srcs, const int32_t* shapes,
                                     int n, float* dst, int size, float scale,
                                     float offset, int filter, int num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  num_threads = std::max(1, std::min(num_threads, n));
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      prep_one(srcs[i], shapes[i * 2], shapes[i * 2 + 1],
               dst + static_cast<size_t>(i) * size * size * 3, size, scale,
               offset, filter);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

}  // extern "C"
