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

static double band_ncc(const std::vector<cplx>& s, int n, int center,
                       int lag) {
  // Complex (analytic-signal) NCC magnitude over a +/- 2-period support
  // around the frame center.  Unwindowed — a Hann window here would cap
  // NCC below 1 for perfectly periodic signals — and complex so that the
  // carrier phase drops out of |corr|: a true period of fs/f0 is rarely
  // an integer, and at a 6 kHz band center a half-sample lag error alone
  // would destroy a REAL correlation (cos(2*pi*6000*0.5/fs) ~ 0.3) while
  // the analytic envelope barely moves.
  const int L = 2 * lag;
  int j0 = std::max(0, center - L);
  int j1 = std::min(n - lag, center + L);
  cplx num(0.0, 0.0);
  double e1 = 0.0, e2 = 0.0;
  for (int j = j0; j < j1; j++) {
    num += s[j] * std::conj(s[j + lag]);
    e1 += std::norm(s[j]);
    e2 += std::norm(s[j + lag]);
  }
  if (e1 <= 1e-30 || e2 <= 1e-30) return 0.0;
  return std::abs(num) / std::sqrt(e1 * e2);
}

extern "C" int crank_band_aperiodicity(const double* x, int n, int fs,
                                       const double* f0, int n_frames,
                                       double shiftms, int fftl,
                                       double* ap_coarse /* [n_frames*n_bands] */) {
  const int n_bands = crank_n_aperiodicities(fs);
  const int hop = (int)std::round(shiftms / 1000.0 * fs);
  (void)fftl;

  // Band-split the WHOLE signal once per band (full-length FFT masking):
  // per-frame windowed band analysis would (a) bias NCC via the window's
  // own autocorrelation decay and (b) smear band edges.  Bands are
  // centered at 3000*(b+1) Hz, the WORLD coarse-ap grid that
  // code/decode_aperiodicity interpolate on.
  size_t N = 1;
  while (N < (size_t)n) N <<= 1;
  std::vector<double> xp(N, 0.0);
  std::copy(x, x + n, xp.begin());
  std::vector<cplx> X;
  rfft(xp.data(), (int)N, X);
  const int halfN = (int)N / 2 + 1;
  // analytic band signals: one-sided masked spectrum, full complex iFFT.
  // Bands are processed one at a time with a single reused N-sized buffer
  // (ap_coarse filled column-by-column) — holding all n_bands full-length
  // complex signals at once costs n_bands*N*16B, which OOMs long-file
  // extraction jobs (e.g. 5 min @ 48 kHz ~ 1.3 GB per joblib worker).
  std::vector<cplx> masked(N);
  for (int b = 0; b < n_bands; b++) {
    const double center_hz = 3000.0 * (b + 1);
    const double lo_hz = (b == 0) ? 0.0 : center_hz - 1500.0;
    const double hi_hz =
        (b == n_bands - 1) ? fs / 2.0 : center_hz + 1500.0;
    const int lo = (int)(lo_hz / fs * (double)N);
    const int hi = std::min(halfN - 1, (int)(hi_hz / fs * (double)N));
    std::fill(masked.begin(), masked.end(), cplx(0.0, 0.0));
    for (int i = lo; i <= hi; i++) masked[i] = X[i];
    fft_inplace(masked, true);

    for (int t = 0; t < n_frames; t++) {
      const double cur_f0 = f0[t];
      if (cur_f0 <= 0.0) {
        // unvoiced frames get maximum aperiodicity (stored as 0 dB = 1.0)
        ap_coarse[(size_t)t * n_bands + b] = 0.0;
        continue;
      }
      const int center = t * hop;
      const int lag0 = std::max(2, (int)std::round((double)fs / cur_f0));
      // lag search +/- 1 sample absorbs F0-estimate rounding; the
      // sub-sample remainder is already handled by the complex NCC
      double best = 0.0;
      for (int lag = lag0 - 1; lag <= lag0 + 1; lag++)
        best = std::max(best, band_ncc(masked, n, center, lag));
      best = std::max(0.0, std::min(1.0, best));
      const double ap = std::sqrt(std::max(1e-12, 1.0 - best));
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
