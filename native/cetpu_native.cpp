// Host-side native library for channelestimationtransformer_tpu.
//
// TPU-native counterpart of the reference's host/native components:
//  - qtorch quant_cpu (reference FullPrecision/qtorch/quant/quant_cpu/quant_cpu.cpp):
//    fixed-point quantization (nearest/stochastic), partial-fraction
//    quantization with threshold selection, fibbinary/Fibonacci
//    nearest-codeword search (reference
//    models/InformerLSQFibbinary/fibbinary_cpu/cpp_fibbinary_functions.cpp).
//  - The torch DataLoader's packing job (reference Utils/dataset.py LoadBatch):
//    complex->real interleave + window extraction, used by the host input
//    pipeline when datasets live on disk rather than in HBM.
//
// On TPU the per-step compute path runs in XLA/Pallas; this library serves the
// host-side paths (weight export, checkpoint post-processing, disk-backed
// ingest) where a device round-trip would be wasteful. Exposed with a plain C
// ABI and bound via ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fixed-point quantization (semantics of quant_cpu.cpp:117-164 +
// sim_helper.cpp round(a, r, sigma) / fixed_min_max).
// ---------------------------------------------------------------------------

static inline void fixed_bounds(int wl, int fl, int symmetric, float* t_min,
                                float* t_max) {
  float res = std::ldexp(1.0f, -fl);
  *t_min = -std::ldexp(1.0f, wl - fl - 1);
  *t_max = -*t_min - res;
  if (symmetric) *t_min += res;
}

void cetpu_fixed_point_quantize_nearest(const float* x, float* out, int64_t n,
                                        int wl, int fl, int clamp,
                                        int symmetric) {
  float t_min, t_max;
  fixed_bounds(wl, fl, symmetric, &t_min, &t_max);
  const float scale = std::ldexp(1.0f, fl);
  for (int64_t i = 0; i < n; ++i) {
    float q = std::nearbyint(x[i] * scale) / scale;  // round-half-even
    if (clamp) q = std::min(std::max(q, t_min), t_max);
    out[i] = q;
  }
}

void cetpu_fixed_point_quantize_stochastic(const float* x, float* out,
                                           int64_t n, int wl, int fl, int clamp,
                                           int symmetric, uint64_t seed) {
  float t_min, t_max;
  fixed_bounds(wl, fl, symmetric, &t_min, &t_max);
  const float scale = std::ldexp(1.0f, fl);
  std::mt19937_64 gen(seed);
  std::uniform_real_distribution<float> dis(0.0f, 1.0f);
  for (int64_t i = 0; i < n; ++i) {
    float q = std::floor(x[i] * scale + dis(gen)) / scale;
    if (clamp) q = std::min(std::max(q, t_min), t_max);
    out[i] = q;
  }
}

// Partial quantization: quantize the `percentage` fraction of elements
// closest (proximal=1) or farthest (proximal=0) from their quantized value
// (reference quant_cpu.cpp:166-211 and the QAT distant variant,
// QuantizationStudy/QuantizationAwareTraining/qtorch/quant/quant_cuda/quant.cu:258-304).
void cetpu_fixed_point_quantize_partial(const float* x, float* out, int64_t n,
                                        int wl, int fl, float percentage,
                                        int clamp, int symmetric,
                                        int proximal) {
  float t_min, t_max;
  fixed_bounds(wl, fl, symmetric, &t_min, &t_max);
  const float scale = std::ldexp(1.0f, fl);
  std::vector<float> q(n), diff(n);
  for (int64_t i = 0; i < n; ++i) {
    q[i] = std::nearbyint(x[i] * scale) / scale;
    diff[i] = std::fabs(x[i] - q[i]);
  }
  std::vector<float> sorted(diff);
  std::sort(sorted.begin(), sorted.end());
  int64_t k = static_cast<int64_t>((n - 1) * percentage);
  k = std::min(std::max<int64_t>(k, 0), n - 1);
  float thr = proximal ? sorted[k] : sorted[n - 1 - k];
  for (int64_t i = 0; i < n; ++i) {
    bool take = proximal ? (diff[i] <= thr) : (diff[i] >= thr);
    if (percentage >= 1.0f) take = true;
    if (percentage <= 0.0f) take = false;
    float v = take ? q[i] : x[i];
    if (clamp) v = std::min(std::max(v, t_min), t_max);
    out[i] = v;
  }
}

// ---------------------------------------------------------------------------
// Nearest-codeword search (reference fibbinary_cpu/cpp_fibbinary_functions.cu
// one-thread-per-element scan; here a branch-light host loop).
// ---------------------------------------------------------------------------

void cetpu_nearest_codeword(const float* x, float* out, int64_t n,
                            const float* codebook, int64_t cb_size) {
  for (int64_t i = 0; i < n; ++i) {
    float best = codebook[0];
    float best_d = std::fabs(x[i] - best);
    for (int64_t c = 1; c < cb_size; ++c) {
      float d = std::fabs(x[i] - codebook[c]);
      if (d < best_d) {
        best_d = d;
        best = codebook[c];
      }
    }
    out[i] = best;
  }
}

// Fibbinary integers (no two adjacent 1 bits) below 2^max_bits, ascending
// (reference LSQ.py:48-54 generator). Returns the count written (capacity-
// bounded).
int64_t cetpu_fibbinary_ints(int max_bits, int64_t* out, int64_t capacity) {
  int64_t count = 0;
  uint64_t x = 0;
  const uint64_t limit = 1ull << max_bits;
  while (x < limit && count < capacity) {
    out[count++] = static_cast<int64_t>(x);
    uint64_t y = ~(x >> 1);
    x = (x - y) & y;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Dataset packing (reference Utils/dataset.py LoadBatch:20-44 + window slice).
// in:  interleaved complex64 [num, slots, nr, nt] (re, im pairs)
// out: float32 [num, win_len, nr*nt*2] windows starting at `starts[i]`.
// ---------------------------------------------------------------------------

void cetpu_pack_windows(const float* h_interleaved, float* out, int64_t num,
                        int64_t slots, int64_t nr, int64_t nt,
                        const int64_t* starts, int64_t win_len) {
  const int64_t feat = nr * nt;           // complex features per slot
  const int64_t slot_stride = feat * 2;   // floats per slot
  const int64_t samp_stride = slots * slot_stride;
  for (int64_t i = 0; i < num; ++i) {
    const float* src = h_interleaved + i * samp_stride + starts[i] * slot_stride;
    float* dst = out + i * win_len * slot_stride;
    // Interleaved complex (re,im) is already the LoadBatch feature layout:
    // flat [Nr*Nt] each expanding to (re, im) pairs — one memcpy per window.
    std::memcpy(dst, src, sizeof(float) * win_len * slot_stride);
  }
}

}  // extern "C"
