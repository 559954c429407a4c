// Spectral envelope estimation — CheapTrick-style (pitch-adaptive windowing,
// frequency-domain smoothing, liftering-based spectral recovery).
//
// Role parity: WORLD CheapTrick via sprocket/pyworld in the reference
// (crank/feature/feature.py:75-85); output is a power spectrogram
// [n_frames, fftl/2+1] suitable for mel-cepstrum extraction and synthesis.
#include <algorithm>
#include <cmath>
#include <vector>

#include "fft.h"

namespace crankdsp {

static const double kDefaultF0 = 160.0;
static const double kQ1 = -0.15;  // CheapTrick liftering coefficient

// rectangular smoothing of a spectrum over +/- width_hz (triangular via
// double boxcar like CheapTrick's LinearSmoothing)
static void linear_smoothing(const std::vector<double>& in, double width_hz,
                             int fs, int fftl, std::vector<double>& out) {
  const int half = fftl / 2 + 1;
  const double bin_hz = (double)fs / fftl;
  const double width_bin = width_hz / bin_hz;
  out.resize(half);
  // integrate
  std::vector<double> cum(half + 1, 0.0);
  for (int i = 0; i < half; i++) cum[i + 1] = cum[i] + in[i];
  for (int i = 0; i < half; i++) {
    double lo = i - width_bin / 2.0;
    double hi = i + width_bin / 2.0;
    lo = std::max(lo, 0.0);
    hi = std::min(hi, (double)(half - 1));
    // linear interpolation of the integral at fractional bins
    auto interp = [&](double p) {
      int ip = (int)p;
      double fr = p - ip;
      if (ip >= half) return cum[half];
      return cum[ip] + fr * (cum[std::min(ip + 1, half)] - cum[ip]);
    };
    const double denom = std::max(hi - lo, 1e-9);
    out[i] = (interp(hi) - interp(lo)) / denom;
  }
}

extern "C" int crank_spectral_envelope(const double* x, int n, int fs,
                                       const double* f0, int n_frames,
                                       double shiftms, int fftl,
                                       double* spc_out /* [n_frames*(fftl/2+1)] */) {
  const int half = fftl / 2 + 1;
  const int hop = (int)std::round(shiftms / 1000.0 * fs);
  std::vector<double> frame(fftl);
  std::vector<cplx> spec;
  std::vector<double> power(half), smoothed(half);

  for (int t = 0; t < n_frames; t++) {
    const double cur_f0 = (f0[t] <= 0.0) ? kDefaultF0 : f0[t];
    // pitch-adaptive window: 3 periods, hann
    int win = (int)(3.0 * fs / cur_f0);
    win = std::min(win, fftl - 1);
    if (win % 2 == 0) win++;
    const int center = t * hop;
    std::fill(frame.begin(), frame.end(), 0.0);
    double wsum = 0.0;
    for (int j = 0; j < win; j++) {
      const int k = center + j - win / 2;
      const double w =
          0.5 - 0.5 * std::cos(2.0 * M_PI * (j + 1) / (double)(win + 1));
      wsum += w * w;
      if (k >= 0 && k < n) frame[j] = x[k] * w;
    }
    rfft(frame.data(), fftl, spec);
    const double norm = 1.0 / std::max(wsum, 1e-12);
    for (int i = 0; i < half; i++) power[i] = std::norm(spec[i]) * norm;

    // frequency smoothing over 2*f0/3 (CheapTrick step 2)
    linear_smoothing(power, 2.0 * cur_f0 / 3.0, fs, fftl, smoothed);

    // liftering-based recovery (CheapTrick step 3): log -> cepstrum ->
    // lifter -> exp
    std::vector<double> logspec(fftl);
    for (int i = 0; i < half; i++)
      logspec[i] = std::log(std::max(smoothed[i], 1e-30));
    for (int i = 1; i < fftl / 2; i++) logspec[fftl - i] = logspec[i];
    std::vector<cplx> cep_in(fftl);
    for (int i = 0; i < fftl; i++) cep_in[i] = cplx(logspec[i], 0.0);
    fft_inplace(cep_in, true);  // -> cepstrum (real)
    const double t0_bins = (double)fs / cur_f0;
    for (int i = 0; i < fftl; i++) {
      const int lag = (i <= fftl / 2) ? i : fftl - i;
      const double q = (double)lag / t0_bins;
      double lifter = 1.0;
      if (lag > 0) {
        const double s = std::sin(M_PI * q);
        lifter = (std::fabs(s) < 1e-12 && q < 0.5)
                     ? 1.0
                     : s / std::max(M_PI * q, 1e-12);
        lifter *= (1.0 + 2.0 * kQ1 * std::cos(2.0 * M_PI * q)) /
                  (1.0 + 2.0 * kQ1);
        // guard: beyond one period the lifter decays naturally
      }
      cep_in[i] *= lifter;
    }
    fft_inplace(cep_in, false);  // back to log spectrum
    for (int i = 0; i < half; i++) {
      spc_out[(size_t)t * half + i] =
          std::exp(std::min(cep_in[i].real(), 60.0));
    }
  }
  return 0;
}

}  // namespace crankdsp
