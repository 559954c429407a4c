// Minimal iterative radix-2 FFT (power-of-two sizes) for the vocoder.
// First-party replacement for the FFT reached through pyworld/librosa in the
// reference dependency chain (SURVEY.md §2.4).
#pragma once
#include <cmath>
#include <complex>
#include <vector>

namespace crankdsp {

using cplx = std::complex<double>;

inline void fft_inplace(std::vector<cplx>& a, bool invert) {
  const size_t n = a.size();
  if (n < 2) return;
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * M_PI / (double)len * (invert ? 1.0 : -1.0);
    const cplx wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cplx w(1.0, 0.0);
      for (size_t k = 0; k < len / 2; k++) {
        cplx u = a[i + k];
        cplx v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert) {
    for (auto& x : a) x /= (double)n;
  }
}

// real signal -> half spectrum (n/2+1 bins)
inline void rfft(const double* x, int n, std::vector<cplx>& out) {
  std::vector<cplx> buf(n);
  for (int i = 0; i < n; i++) buf[i] = cplx(x[i], 0.0);
  fft_inplace(buf, false);
  out.assign(buf.begin(), buf.begin() + n / 2 + 1);
}

// half spectrum (n/2+1 bins) -> real signal of length n
inline void irfft(const std::vector<cplx>& half, int n, std::vector<double>& out) {
  std::vector<cplx> buf(n);
  for (int i = 0; i <= n / 2; i++) buf[i] = half[i];
  for (int i = 1; i < n / 2; i++) buf[n - i] = std::conj(half[i]);
  fft_inplace(buf, true);
  out.resize(n);
  for (int i = 0; i < n; i++) out[i] = buf[i].real();
}

}  // namespace crankdsp
