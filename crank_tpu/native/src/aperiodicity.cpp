// Band aperiodicity estimation (D4C-equivalent role) + code/decode.
//
// Per frame and per 3 kHz coarse band (WORLD's coarse grid), aperiodicity is
// estimated as 1 - NCC: the normalized cross-correlation of the band-passed
// signal at lag T0.  Full-band aperiodicity [n_frames, fftl/2+1] is produced
// by linear interpolation over the coarse bands, matching the
// decode_aperiodicity contract of the reference dependency chain
// (crank/feature/feature.py:98-107, sprocket Synthesizer).
#include <algorithm>
#include <cmath>
#include <vector>

#include "fft.h"

namespace crankdsp {

extern "C" int crank_n_aperiodicities(int fs) {
  // WORLD: coarse bands at 3 kHz spacing up to min(15 kHz, fs/2 - 3 kHz)
  const double upper = std::min(15000.0, fs / 2.0 - 3000.0);
  return std::max(1, (int)(upper / 3000.0));
}

extern "C" int crank_band_aperiodicity(const double* x, int n, int fs,
                                       const double* f0, int n_frames,
                                       double shiftms, int fftl,
                                       double* ap_coarse /* [n_frames*n_bands] */) {
  const int n_bands = crank_n_aperiodicities(fs);
  const int hop = (int)std::round(shiftms / 1000.0 * fs);
  const int half = fftl / 2 + 1;
  std::vector<double> frame(fftl);
  std::vector<cplx> spec(half);
  std::vector<double> band(fftl);

  for (int t = 0; t < n_frames; t++) {
    const double cur_f0 = f0[t];
    if (cur_f0 <= 0.0) {
      // unvoiced frames get maximum aperiodicity (stored as 0 dB = 1.0)
      for (int b = 0; b < n_bands; b++)
        ap_coarse[(size_t)t * n_bands + b] = 0.0;
      continue;
    }
    const int center = t * hop;
    // window ~ 2 periods + band analysis via FFT masking
    int win = std::min(fftl, (int)(4.0 * fs / cur_f0));
    std::fill(frame.begin(), frame.end(), 0.0);
    for (int j = 0; j < win; j++) {
      const int k = center + j - win / 2;
      const double w = 0.5 - 0.5 * std::cos(2.0 * M_PI * j / (win - 1.0));
      if (k >= 0 && k < n) frame[j] = x[k] * w;
    }
    std::vector<cplx> full;
    rfft(frame.data(), fftl, full);

    const int lag = (int)std::round((double)fs / cur_f0);
    for (int b = 0; b < n_bands; b++) {
      const double lo_hz = 3000.0 * b;
      const double hi_hz = 3000.0 * (b + 1);
      const int lo = (int)(lo_hz / fs * fftl);
      const int hi = std::min(half - 1, (int)(hi_hz / fs * fftl));
      // band-pass via spectral masking
      std::vector<cplx> masked(half, cplx(0.0, 0.0));
      for (int i = lo; i <= hi; i++) masked[i] = full[i];
      irfft(masked, fftl, band);
      // normalized autocorrelation at T0 lag
      double num = 0.0, e1 = 0.0, e2 = 0.0;
      const int m = fftl - lag;
      for (int j = 0; j < m; j++) {
        num += band[j] * band[j + lag];
        e1 += band[j] * band[j];
        e2 += band[j + lag] * band[j + lag];
      }
      double ncc = (e1 > 1e-30 && e2 > 1e-30)
                       ? num / std::sqrt(e1 * e2)
                       : 0.0;
      ncc = std::max(0.0, std::min(1.0, ncc));
      const double ap = std::sqrt(std::max(1e-12, 1.0 - ncc));
      // store in dB-like log domain (WORLD codes coarse ap in dB)
      ap_coarse[(size_t)t * n_bands + b] =
          20.0 * std::log10(std::max(ap, 1e-6));
    }
  }
  return 0;
}

// coarse (dB, 3kHz grid) -> full band linear amplitude [0, 1]
extern "C" int crank_decode_aperiodicity(const double* ap_coarse, int n_frames,
                                         int fs, int fftl, double* ap_full) {
  const int n_bands = crank_n_aperiodicities(fs);
  const int half = fftl / 2 + 1;
  for (int t = 0; t < n_frames; t++) {
    for (int i = 0; i < half; i++) {
      const double hz = (double)i * fs / fftl;
      // coarse band centers at 3000*(b+1) Hz (WORLD coarse grid)
      double pos = hz / 3000.0 - 1.0;
      double v;
      if (pos <= 0.0) {
        v = ap_coarse[(size_t)t * n_bands + 0];
      } else if (pos >= n_bands - 1) {
        v = ap_coarse[(size_t)t * n_bands + n_bands - 1];
      } else {
        const int b = (int)pos;
        const double fr = pos - b;
        v = (1.0 - fr) * ap_coarse[(size_t)t * n_bands + b] +
            fr * ap_coarse[(size_t)t * n_bands + b + 1];
      }
      ap_full[(size_t)t * half + i] =
          std::min(1.0, std::pow(10.0, v / 20.0));
    }
  }
  return 0;
}

}  // namespace crankdsp
