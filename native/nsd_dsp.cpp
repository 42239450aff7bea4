// Native DSP for neural_speech_decoding_tpu.
//
// The reference's collection path filters every channel through BrainFlow's
// C++ DataFilter (detrend + Butterworth zero-phase cascades — SURVEY.md
// §2.3). The TPU-native equivalent for batch/device work is ops/iir.py;
// this file is the host-side native equivalent for contexts without a
// device (embedded collectors, preprocessing on ingest hosts): in-place
// biquad cascades (direct form II transposed, matching scipy.signal.sosfilt)
// with an optional pad-free forward-backward zero-phase pass. Coefficient
// design stays host-side (scipy/numpy) and is passed in as [S, 6] rows
// (b0 b1 b2 a0 a1 a2, a0 == 1).

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

void run_cascade(double* x, long n, const double* sos, int sections,
                 std::vector<double>& z) {
  // z: [sections][2], caller-initialized
  for (long t = 0; t < n; ++t) {
    double y = x[t];
    for (int s = 0; s < sections; ++s) {
      const double* c = sos + 6 * s;
      double* zs = &z[2 * s];
      const double out = c[0] * y + zs[0];
      zs[0] = c[1] * y - c[4] * out + zs[1];
      zs[1] = c[2] * y - c[5] * out;
      y = out;
    }
    x[t] = y;
  }
}

}  // namespace

extern "C" {

void nsd_dsp_detrend_constant(double* x, long n) {
  if (n <= 0) return;
  double mean = 0.0;
  for (long i = 0; i < n; ++i) mean += x[i];
  mean /= static_cast<double>(n);
  for (long i = 0; i < n; ++i) x[i] -= mean;
}

// In-place causal cascade (scipy.signal.sosfilt semantics, zero initial
// conditions). Returns 0 on success.
int nsd_dsp_sosfilt(double* x, long n, const double* sos, int sections) {
  if (!x || !sos || n <= 0 || sections <= 0) return 1;
  std::vector<double> z(2 * sections, 0.0);
  run_cascade(x, n, sos, sections, z);
  return 0;
}

// In-place pad-free zero-phase filtering: forward pass, then the reversed
// signal through the same cascade (BrainFlow's BUTTERWORTH_ZERO_PHASE
// behavior). Returns 0 on success.
int nsd_dsp_sosfiltfilt(double* x, long n, const double* sos, int sections) {
  if (nsd_dsp_sosfilt(x, n, sos, sections)) return 1;
  std::reverse(x, x + n);
  int rc = nsd_dsp_sosfilt(x, n, sos, sections);
  std::reverse(x, x + n);
  return rc;
}

}  // extern "C"
