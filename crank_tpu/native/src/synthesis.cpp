// Waveform synthesis from (f0, spectral envelope, aperiodicity) —
// WORLD-synthesis-equivalent role (reference chain:
// crank/utils/utils.py:154-171 -> sprocket Synthesizer -> pyworld.synthesize).
//
// Pulse-synchronous excitation: minimum-phase impulse responses of the
// periodic spectrum at each glottal pulse (scaled for unit average power),
// plus frame-OLA filtered white noise for the aperiodic component.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#include "fft.h"

namespace crankdsp {

// minimum-phase impulse response from a power spectrum (half = n/2+1 bins)
static void min_phase_ir(const std::vector<double>& power, int fftl,
                         std::vector<double>& ir) {
  const int half = fftl / 2 + 1;
  std::vector<cplx> buf(fftl);
  for (int i = 0; i < half; i++) {
    buf[i] = cplx(0.5 * std::log(std::max(power[i], 1e-30)), 0.0);
  }
  for (int i = 1; i < fftl / 2; i++) buf[fftl - i] = buf[i];
  fft_inplace(buf, true);  // cepstrum
  // fold to causal (minimum phase)
  for (int i = 1; i < fftl / 2; i++) buf[i] *= 2.0;
  for (int i = fftl / 2 + 1; i < fftl; i++) buf[i] = cplx(0.0, 0.0);
  fft_inplace(buf, false);  // log spectrum (complex)
  for (int i = 0; i < fftl; i++) buf[i] = std::exp(buf[i]);
  fft_inplace(buf, true);  // impulse response
  ir.resize(fftl);
  for (int i = 0; i < fftl; i++) ir[i] = buf[i].real();
}

static uint64_t rng_state = 88172645463325252ull;
static inline double frand() {
  // xorshift64 -> uniform in [-1, 1)
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (double)(int64_t)rng_state / 9.223372036854776e18;
}

extern "C" int crank_synthesize(const double* f0, int n_frames,
                                const double* spc /* [n_frames*half] power */,
                                const double* ap /* [n_frames*half] 0..1 */,
                                int fftl, int fs, double shiftms,
                                double* y_out, int y_len) {
  const int half = fftl / 2 + 1;
  const int hop = (int)std::round(shiftms / 1000.0 * fs);
  const int n = std::min(y_len, n_frames * hop);
  std::fill(y_out, y_out + y_len, 0.0);

  std::vector<double> per(half), aper(half), ir;

  // ---- periodic component: pulse-synchronous min-phase IRs ----
  double phase = 0.0;
  for (int i = 0; i < n; i++) {
    const int t = std::min(i / hop, n_frames - 1);
    const double cur_f0 = f0[t];
    if (cur_f0 <= 0.0) {
      phase = 0.0;
      continue;
    }
    phase += cur_f0 / fs;
    if (phase >= 1.0) {
      phase -= 1.0;
      const size_t off = (size_t)t * half;
      for (int k = 0; k < half; k++) {
        const double a = std::min(ap[off + k], 0.999999);
        per[k] = spc[off + k] * (1.0 - a * a);
      }
      min_phase_ir(per, fftl, ir);
      const double scale = std::sqrt((double)fs / cur_f0);
      const int m = std::min(fftl, y_len - i);
      for (int j = 0; j < m; j++) y_out[i + j] += ir[j] * scale;
    }
  }

  // ---- aperiodic component: noise through per-frame min-phase filter ----
  const int seg = 2 * hop;  // 50% overlapped hann segments
  std::vector<double> noise(seg), win(seg), filt;
  for (int j = 0; j < seg; j++)
    win[j] = 0.5 - 0.5 * std::cos(2.0 * M_PI * j / (seg - 1.0));
  std::vector<cplx> nspec, hspec;
  for (int t = 0; t < n_frames; t++) {
    const size_t off = (size_t)t * half;
    const bool voiced = f0[t] > 0.0;
    for (int k = 0; k < half; k++) {
      const double a = voiced ? std::min(ap[off + k], 0.999999) : 1.0;
      aper[k] = spc[off + k] * a * a;
    }
    min_phase_ir(aper, fftl, filt);
    // noise segment convolved via FFT (segment + IR tail <= 2*fftl)
    int conv_n = 1;
    while (conv_n < seg + fftl) conv_n <<= 1;
    std::vector<double> xs(conv_n, 0.0), hs(conv_n, 0.0);
    for (int j = 0; j < seg; j++) xs[j] = frand() * win[j] * 1.732;  // unit var
    for (int j = 0; j < fftl; j++) hs[j] = filt[j];
    rfft(xs.data(), conv_n, nspec);
    rfft(hs.data(), conv_n, hspec);
    for (size_t k = 0; k < nspec.size(); k++) nspec[k] *= hspec[k];
    std::vector<double> conv;
    irfft(nspec, conv_n, conv);
    const int start = t * hop - hop;
    for (int j = 0; j < conv_n; j++) {
      const int k = start + j;
      if (k >= 0 && k < y_len) y_out[k] += conv[j];
    }
  }
  return 0;
}

}  // namespace crankdsp
