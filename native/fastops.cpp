// fastops — native host-side data-pipeline kernels.
//
// The reference accelerates its data corruption with numba JIT
// (lib/datasets/pseudo_hole.py:8) and leans on torch DataLoader worker
// processes for decode throughput. Here the per-sample hot loops are plain
// C++ (-O3, no dependencies), exposed over a C ABI for ctypes
// (rdfc_gan_tpu/data/fastops.py). Every entry point releases the GIL by
// construction (pure C, called via ctypes), so the threaded loader overlaps
// them with the device step.
//
// Build: native/build.sh  ->  native/libfastops.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>

extern "C" {

// Zero-preserving depth normalization: out = (d - mean) / std, except
// exactly-zero (hole) pixels stay 0 (preprocessing.py:40-50 semantics).
void depth_normalize_zero_preserve(const float* depth, float* out, long n,
                                   float mean, float std_) {
  const float inv = 1.0f / std_;
  for (long i = 0; i < n; ++i) {
    const float d = depth[i];
    out[i] = (d <= 1e-8f) ? 0.0f : (d - mean) * inv;
  }
}

// Sparse sampling: keep exactly `num_sample` random valid (> t_valid)
// pixels, zero the rest (nyuv2 500-point protocol). Deterministic in `seed`.
void sparse_sample(const float* depth, float* out, long n, long num_sample,
                   float t_valid, uint64_t seed) {
  std::memset(out, 0, sizeof(float) * n);
  // reservoir-sample indices of valid pixels
  std::mt19937_64 rng(seed);
  long* reservoir = new long[num_sample];
  long seen = 0;
  for (long i = 0; i < n; ++i) {
    if (depth[i] > t_valid) {
      if (seen < num_sample) {
        reservoir[seen] = i;
      } else {
        std::uniform_int_distribution<long> dist(0, seen);
        long j = dist(rng);
        if (j < num_sample) reservoir[j] = i;
      }
      ++seen;
    }
  }
  const long kept = std::min(seen, num_sample);
  for (long k = 0; k < kept; ++k) out[reservoir[k]] = depth[reservoir[k]];
  delete[] reservoir;
}

// Rectangle hole punching (pseudo_hole.py hole_image): zero `num` rectangles
// of (height x width); placement uniform over valid anchors. The reference's
// transposed no-overlap bookkeeping admits overlaps; we reproduce the
// *effective* behavior (independent placements).
void hole_image(float* img, long H, long W, long hole_h, long hole_w,
                long num, uint64_t seed) {
  std::mt19937_64 rng(seed);
  const long rows = H - hole_h + 1, cols = W - hole_w + 1;
  if (rows <= 0 || cols <= 0) return;
  std::uniform_int_distribution<long> ry(0, rows - 1), rx(0, cols - 1);
  for (long k = 0; k < num; ++k) {
    const long y0 = ry(rng), x0 = rx(rng);
    for (long y = y0; y < y0 + hole_h; ++y)
      std::memset(img + y * W + x0, 0, sizeof(float) * hole_w);
  }
}

// SUNRGBD bit-shift depth decode: (d >> 3 | d << 13) / 1000 meters
// (sunrgbd_dataset.py:258-264).
void sunrgbd_depth_decode(const uint16_t* depth, float* out, long n) {
  for (long i = 0; i < n; ++i) {
    const uint16_t d = depth[i];
    const uint16_t v = (uint16_t)((d >> 3) | (d << 13));
    out[i] = (float)v * 1e-3f;
  }
}

// Salt-and-pepper mask generation (helper.py:384-402): per pixel,
// P(salt) = P(pepper) = (1-snr)/2. Writes 0/1/2 labels.
void pepper_mask(uint8_t* mask, long n, float snr, uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> u(0.0f, 1.0f);
  const float half = (1.0f - snr) * 0.5f;
  for (long i = 0; i < n; ++i) {
    const float r = u(rng);
    mask[i] = (r < snr) ? 0 : (r < snr + half ? 1 : 2);
  }
}

// uint16 millimeter png buffer -> float meters with scale.
void depth_mm_to_m(const uint16_t* depth, float* out, long n, float scale) {
  for (long i = 0; i < n; ++i) out[i] = (float)depth[i] * scale;
}

}  // extern "C"
