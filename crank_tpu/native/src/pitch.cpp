// F0 estimation: YIN (cumulative mean normalized difference) with parabolic
// interpolation, speaker-dependent search range and frame shift, plus a
// median-filtered voicing decision.
//
// Role parity: the reference's F0 analyzer (WORLD harvest via sprocket,
// crank/feature/feature.py:75-88) — same inputs (x, fs, shiftms, minf0,
// maxf0), same output contract (f0[t] in Hz, 0 for unvoiced frames).
#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace crankdsp {

static double parabolic_min(const double* d, int i, int lo, int hi, double* val) {
  if (i <= lo || i >= hi - 1) {
    *val = d[i];
    return (double)i;
  }
  const double a = d[i - 1], b = d[i], c = d[i + 1];
  const double denom = a - 2.0 * b + c;
  if (std::fabs(denom) < 1e-12) {
    *val = b;
    return (double)i;
  }
  const double shift = 0.5 * (a - c) / denom;
  *val = b - 0.25 * (a - c) * shift;
  return (double)i + shift;
}

// YIN per frame. Returns f0 (0 if unvoiced candidate too weak).
static double yin_frame(const double* x, int n, int fs, double minf0,
                        double maxf0, double threshold, double* best_cmndf) {
  const int tau_min = std::max(2, (int)(fs / maxf0));
  const int tau_max = std::min(n / 2, (int)(fs / minf0) + 1);
  if (tau_max <= tau_min + 2) {
    *best_cmndf = 1.0;
    return 0.0;
  }
  const int w = n / 2;  // integration window
  std::vector<double> d(tau_max, 0.0);
  for (int tau = tau_min; tau < tau_max; tau++) {
    double acc = 0.0;
    for (int j = 0; j < w; j++) {
      const double diff = x[j] - x[j + tau];
      acc += diff * diff;
    }
    d[tau] = acc;
  }
  // cumulative mean normalized difference
  std::vector<double> cm(tau_max, 1.0);
  double running = 0.0;
  for (int tau = 1; tau < tau_max; tau++) {
    running += (tau >= tau_min) ? d[tau] : 0.0;
  }
  running = 0.0;
  for (int tau = tau_min; tau < tau_max; tau++) {
    running += d[tau];
    cm[tau] = (running > 0.0)
                  ? d[tau] * (tau - tau_min + 1) / running
                  : 1.0;
  }
  // absolute threshold: first dip below threshold, else global min
  int best = -1;
  for (int tau = tau_min + 1; tau < tau_max - 1; tau++) {
    if (cm[tau] < threshold && cm[tau] <= cm[tau + 1] && cm[tau] < cm[tau - 1]) {
      best = tau;
      break;
    }
  }
  if (best < 0) {
    best = tau_min;
    for (int tau = tau_min; tau < tau_max; tau++)
      if (cm[tau] < cm[best]) best = tau;
  }
  double val;
  const double tau_star =
      parabolic_min(cm.data(), best, tau_min, tau_max, &val);
  *best_cmndf = val;
  if (val > threshold * 2.5) return 0.0;  // clearly aperiodic
  return (double)fs / tau_star;
}

extern "C" int crank_f0_analyze(const double* x, int n, int fs, double shiftms,
                                double minf0, double maxf0, double* f0_out,
                                int n_frames) {
  const double frame_period = shiftms / 1000.0;
  const int hop = (int)std::round(frame_period * fs);
  // analysis window: at least 4 periods of the lowest F0
  int win = (int)(4.0 * fs / minf0);
  if (win % 2) win++;
  std::vector<double> cmndf(n_frames, 1.0);
  std::vector<double> power(n_frames, 0.0);
  std::vector<double> buf(win, 0.0);

  for (int t = 0; t < n_frames; t++) {
    const int center = t * hop;
    const int start = center - win / 2;
    for (int j = 0; j < win; j++) {
      const int k = start + j;
      buf[j] = (k >= 0 && k < n) ? x[k] : 0.0;
    }
    double pw = 0.0;
    for (int j = 0; j < win; j++) pw += buf[j] * buf[j];
    power[t] = pw / win;
    f0_out[t] = yin_frame(buf.data(), win, fs, minf0, maxf0, 0.15, &cmndf[t]);
  }

  // power-based unvoiced gating (relative to utterance peak power)
  double max_pw = 1e-30;
  for (int t = 0; t < n_frames; t++) max_pw = std::max(max_pw, power[t]);
  for (int t = 0; t < n_frames; t++) {
    if (power[t] < max_pw * 1e-4) f0_out[t] = 0.0;
    if (f0_out[t] < minf0 || f0_out[t] > maxf0) f0_out[t] = 0.0;
  }

  // 3-point median smoothing to kill octave spikes
  std::vector<double> sm(f0_out, f0_out + n_frames);
  for (int t = 1; t + 1 < n_frames; t++) {
    double a = sm[t - 1], b = sm[t], c = sm[t + 1];
    double lo = std::min({a, b, c}), hi = std::max({a, b, c});
    f0_out[t] = a + b + c - lo - hi;
  }
  // remove isolated voiced frames
  for (int t = 1; t + 1 < n_frames; t++) {
    if (f0_out[t] > 0 && f0_out[t - 1] == 0 && f0_out[t + 1] == 0)
      f0_out[t] = 0.0;
  }
  return 0;
}

}  // namespace crankdsp
