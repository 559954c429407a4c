// Frequency transform (all-pass warping) for mel-cepstrum analysis —
// SPTK freqt equivalent (reference chain: pysptk via sprocket,
// crank/feature/feature.py:94-96).  Batched over frames.
#include <algorithm>
#include <cmath>
#include <vector>

namespace crankdsp {

extern "C" int crank_freqt(const double* c, int n_frames, int m1, int m2,
                           double alpha, double* out) {
  // c: [n_frames, m1+1]; out: [n_frames, m2+1]
  const double aa = 1.0 - alpha * alpha;
  std::vector<double> d(m2 + 1), g(m2 + 1);
  for (int t = 0; t < n_frames; t++) {
    const double* ct = c + (size_t)t * (m1 + 1);
    std::fill(g.begin(), g.end(), 0.0);
    for (int i = m1; i >= 0; i--) {
      d = g;
      g[0] = ct[i] + alpha * d[0];
      if (m2 >= 1) g[1] = aa * d[0] + alpha * d[1];
      for (int j = 2; j <= m2; j++) {
        g[j] = d[j - 1] + alpha * (d[j] - g[j - 1]);
      }
    }
    double* ot = out + (size_t)t * (m2 + 1);
    for (int j = 0; j <= m2; j++) ot[j] = g[j];
  }
  return 0;
}

// cepstrum -> impulse response (SPTK c2ir), batched; returns energies
extern "C" int crank_c2ir_energy(const double* c, int n_frames, int order,
                                 int irlen, double* energy) {
  std::vector<double> ir(irlen);
  for (int t = 0; t < n_frames; t++) {
    const double* ct = c + (size_t)t * (order + 1);
    ir[0] = 1.0;
    // h(0) = exp(c(0)); h(n) = sum_{k=1..n} (k/n) c(k) h(n-k)
    double e = 0.0;
    std::vector<double> h(irlen, 0.0);
    h[0] = std::exp(ct[0]);
    for (int n = 1; n < irlen; n++) {
      double acc = 0.0;
      for (int k = 1; k <= n && k <= order; k++) {
        acc += (double)k / n * ct[k] * h[n - k];
      }
      h[n] = acc;
    }
    for (int n = 0; n < irlen; n++) e += h[n] * h[n];
    energy[t] = e;
  }
  return 0;
}

}  // namespace crankdsp
