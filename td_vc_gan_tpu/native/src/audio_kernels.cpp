// Native host DSP kernels for the input pipeline and eval harness.
//
// The reference reaches C/C++ through third-party wheels (scipy sosfilt,
// fastdtw, Praat — SURVEY.md §2.9). This library provides first-party
// equivalents for the pieces on our hot host paths:
//   - sosfilt:   biquad-cascade IIR filtering (ContentVec random EQ)
//   - dtw_path:  full dynamic-time-warp alignment (MCD eval; replaces fastdtw)
//   - psola_ola: windowed grain overlap-add inner loop (formant/pitch warp)
//
// Exposed as a plain C ABI consumed via ctypes (td_vc_gan_tpu.native).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Second-order-sections IIR, direct form II transposed, in-place.
// sos: n_sections x 6 (b0 b1 b2 a0 a1 a2), a0 assumed 1.
void tdvc_sosfilt(const double* sos, int n_sections, double* x, int64_t n) {
  std::vector<double> z1(n_sections, 0.0), z2(n_sections, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    double v = x[i];
    for (int s = 0; s < n_sections; ++s) {
      const double* c = sos + 6 * s;
      double y = c[0] * v + z1[s];
      z1[s] = c[1] * v - c[4] * y + z2[s];
      z2[s] = c[2] * v - c[5] * y;
      v = y;
    }
    x[i] = v;
  }
}

// Full DTW over a precomputed distance matrix dist (n x m, row-major).
// Writes the alignment path (pairs of int32 (i, j), backtracked, in order)
// into path_out (capacity >= n + m entries of 2 ints) and returns its length.
// Accumulated cost written to *total_cost.
int tdvc_dtw_path(const float* dist, int n, int m, int32_t* path_out,
                  double* total_cost) {
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> acc((size_t)n * m);
  std::vector<int8_t> move((size_t)n * m);  // 0=diag 1=up(i-1) 2=left(j-1)
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < m; ++j) {
      double d = dist[(size_t)i * m + j];
      double best;
      int8_t mv;
      if (i == 0 && j == 0) {
        best = 0.0;
        mv = 0;
      } else {
        double diag = (i > 0 && j > 0) ? acc[(size_t)(i - 1) * m + (j - 1)] : INF;
        double up = (i > 0) ? acc[(size_t)(i - 1) * m + j] : INF;
        double left = (j > 0) ? acc[(size_t)i * m + (j - 1)] : INF;
        best = diag; mv = 0;
        if (up < best) { best = up; mv = 1; }
        if (left < best) { best = left; mv = 2; }
      }
      acc[(size_t)i * m + j] = d + best;
      move[(size_t)i * m + j] = mv;
    }
  }
  *total_cost = acc[(size_t)n * m - 1];
  // backtrack
  int i = n - 1, j = m - 1;
  int len = 0;
  std::vector<int32_t> rev;
  rev.reserve(2 * (n + m));
  while (true) {
    rev.push_back(i);
    rev.push_back(j);
    ++len;
    if (i == 0 && j == 0) break;
    int8_t mv = move[(size_t)i * m + j];
    if (mv == 0 && i > 0 && j > 0) { --i; --j; }
    else if (mv == 1 && i > 0) { --i; }
    else if (j > 0) { --j; }
    else { --i; }
  }
  for (int k = 0; k < len; ++k) {
    path_out[2 * k] = rev[2 * (len - 1 - k)];
    path_out[2 * k + 1] = rev[2 * (len - 1 - k) + 1];
  }
  return len;
}

// PSOLA overlap-add inner loop: place Hann-windowed grains from `wav` (length
// n) centered at analysis positions ana[k] with half-width half[k], at output
// positions pos[k], accumulating into out/norm (length out_len).
void tdvc_psola_ola(const float* wav, int64_t n, const int64_t* ana,
                    const int64_t* pos, const int32_t* half, int64_t n_grains,
                    float* out, float* norm, int64_t out_len) {
  for (int64_t k = 0; k < n_grains; ++k) {
    int64_t h = half[k];
    if (h <= 0) continue;
    int64_t width = 2 * h;
    int64_t center = ana[k];
    int64_t opos = pos[k] - h;
    for (int64_t t = 0; t < width; ++t) {
      int64_t src = center - h + t;
      int64_t dst = opos + t;
      if (src < 0 || src >= n || dst < 0 || dst >= out_len) continue;
      float w = 0.5f * (1.0f - std::cos(2.0f * 3.14159265358979323846f * t / width));
      out[dst] += wav[src] * w;
      norm[dst] += w;
    }
  }
}

// Batched SPTK frequency transform (Oppenheim all-pass warp recursion):
// c (n_frames x len, row-major) -> out (n_frames x (order+1)). Used by
// eval/world.py sp2mc for the WORLD/SPTK-compatible mel-cepstra.
void tdvc_freqt(const double* c, int64_t n_frames, int len, int order,
                double alpha, double* out) {
  const double beta = 1.0 - alpha * alpha;
  std::vector<double> d((size_t)order + 1), g((size_t)order + 1);
  for (int64_t f = 0; f < n_frames; ++f) {
    std::fill(g.begin(), g.end(), 0.0);
    const double* cf = c + (size_t)f * len;
    for (int k = len - 1; k >= 0; --k) {
      d = g;
      g[0] = cf[k] + alpha * d[0];
      if (order >= 1) g[1] = beta * d[0] + alpha * d[1];
      for (int i = 2; i <= order; ++i) g[i] = d[i - 1] + alpha * (d[i] - g[i - 1]);
    }
    std::memcpy(out + (size_t)f * (order + 1), g.data(),
                sizeof(double) * (order + 1));
  }
}

int tdvc_version() { return 2; }

}  // extern "C"
