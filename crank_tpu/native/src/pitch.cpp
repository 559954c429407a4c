// F0 estimation, harvest-grade (round 2 upgrade).
//
// Pipeline per utterance:
//   1. Per frame: exact YIN cumulative-mean-normalized difference function
//      (CMNDF), computed with one FFT cross-correlation per frame instead of
//      the O(w * tau_max) direct loop.
//   2. Multiple F0 candidates per frame (local CMNDF minima, parabolic
//      sub-sample interpolation).
//   3. Viterbi tracking over {candidates + unvoiced} with an octave-jump
//      penalty and voicing-switch hysteresis — this is what gives clean
//      voiced/unvoiced boundaries and kills octave errors that a per-frame
//      decision cannot.
//   4. StoneMask-style refinement of the winning track: normalized
//      cross-correlation peak with parabolic interpolation around the chosen
//      lag for sub-sample F0 precision, plus an NCC-based voicing veto.
//
// Role parity: the reference's F0 analyzer (WORLD harvest + StoneMask via
// sprocket, crank/feature/feature.py:75-88) — same inputs (x, fs, shiftms,
// minf0, maxf0), same output contract (f0[t] in Hz, 0 for unvoiced frames).
#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#include "fft.h"

namespace crankdsp {

namespace {

constexpr int kMaxCand = 5;
constexpr double kCandThresh = 0.75;   // CMNDF ceiling for candidacy
constexpr double kUvBias = 0.70;       // unvoiced emission scale
constexpr double kOctaveW = 2.5;       // transition cost per octave of jump
constexpr double kSwitchCost = 0.25;   // voiced <-> unvoiced switch cost
constexpr double kPowerGate = 1e-4;    // rel. frame power below which = silence
constexpr double kNccVeto = 0.22;      // refined NCC below this -> unvoiced

struct Cand {
  double tau;    // fractional lag (samples)
  double cmndf;  // interpolated CMNDF value at the minimum
};

double parabolic_refine(const double* d, int i, int lo, int hi, double* val) {
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

// CMNDF over lags [1, tau_max) for one frame, via FFT cross-correlation.
//   d(tau) = E(0) + E(tau) - 2 rho(tau),   rho(tau) = sum_j x[j] x[j+tau]
//   cm(tau) = d(tau) * tau / sum_{s<=tau} d(s)
void cmndf_frame(const double* x, int win, int w, int tau_max, int fft_n,
                 std::vector<double>& cm) {
  std::vector<cplx> A(fft_n), B(fft_n);
  for (int i = 0; i < fft_n; i++) {
    A[i] = cplx(i < win ? x[i] : 0.0, 0.0);
    B[i] = cplx(i < w ? x[i] : 0.0, 0.0);
  }
  fft_inplace(A, false);
  fft_inplace(B, false);
  for (int i = 0; i < fft_n; i++) A[i] *= std::conj(B[i]);
  fft_inplace(A, true);

  // prefix sums of x^2 for the sliding energy term
  std::vector<double> ps(win + 1, 0.0);
  for (int i = 0; i < win; i++) ps[i + 1] = ps[i] + x[i] * x[i];
  const double e0 = ps[w];

  cm.assign(tau_max, 1.0);
  double running = 0.0;
  for (int tau = 1; tau < tau_max; tau++) {
    const double e_tau = ps[std::min(tau + w, win)] - ps[std::min(tau, win)];
    double d = e0 + e_tau - 2.0 * A[tau].real();
    if (d < 0.0) d = 0.0;  // FFT round-off
    running += d;
    cm[tau] = (running > 0.0) ? d * tau / running : 1.0;
  }
}

// StoneMask-role refinement: NCC peak with parabolic interpolation around the
// tracked lag. Returns refined fractional lag; *ncc gets the peak value.
double ncc_refine(const double* x, int win, int w, int tau_max, double tau0,
                  double* ncc) {
  const int center = (int)std::lround(tau0);
  const int lo = std::max(2, center - 4);
  const int hi = std::min(tau_max - 1, center + 5);
  if (hi - lo < 3) {
    *ncc = 0.0;
    return tau0;
  }
  std::vector<double> score(hi - lo, -1.0);
  double e0 = 0.0;
  for (int j = 0; j < w; j++) e0 += x[j] * x[j];
  for (int tau = lo; tau < hi; tau++) {
    if (tau + w > win) break;
    double rho = 0.0, et = 0.0;
    for (int j = 0; j < w; j++) {
      rho += x[j] * x[j + tau];
      et += x[j + tau] * x[j + tau];
    }
    const double denom = std::sqrt(e0 * et);
    score[tau - lo] = (denom > 1e-30) ? rho / denom : 0.0;
  }
  int best = 0;
  for (int i = 1; i < (int)score.size(); i++)
    if (score[i] > score[best]) best = i;
  // maximize: negate for the minimizing parabolic helper
  std::vector<double> neg(score.size());
  for (size_t i = 0; i < score.size(); i++) neg[i] = -score[i];
  double val;
  const double t = parabolic_refine(neg.data(), best, 0, (int)neg.size(), &val);
  *ncc = -val;
  return lo + t;
}

}  // namespace

extern "C" int crank_f0_analyze(const double* x, int n, int fs, double shiftms,
                                double minf0, double maxf0, double* f0_out,
                                int n_frames) {
  const double frame_period = shiftms / 1000.0;
  const int hop = (int)std::round(frame_period * fs);
  // analysis window: at least 4 periods of the lowest F0
  int win = (int)(4.0 * fs / minf0);
  if (win % 2) win++;
  const int w = win / 2;  // integration window
  const int tau_min = std::max(2, (int)(fs / maxf0));
  const int tau_max = std::min(w, (int)(fs / minf0) + 2);
  if (tau_max <= tau_min + 2) {
    std::fill(f0_out, f0_out + n_frames, 0.0);
    return 0;
  }
  int fft_n = 1;
  while (fft_n < win + tau_max) fft_n <<= 1;

  // ---- pass 1: per-frame candidates -------------------------------------
  // one scratch window, re-extracted on demand in pass 3 — materializing
  // all frames costs n_frames*win doubles (hundreds of MB for long 48 kHz
  // recordings with low minf0, multiplied by extraction workers)
  std::vector<std::vector<Cand>> cands(n_frames);
  std::vector<double> best_cm(n_frames, 1.0);
  std::vector<double> power(n_frames, 0.0);
  std::vector<double> frame_buf(win);
  const auto extract = [&](int t, double* buf) {
    const int start = t * hop - w;  // window centered on the frame
    for (int j = 0; j < win; j++) {
      const int k = start + j;
      buf[j] = (k >= 0 && k < n) ? x[k] : 0.0;
    }
  };
  std::vector<double> cm;
  for (int t = 0; t < n_frames; t++) {
    double* buf = frame_buf.data();
    extract(t, buf);
    double pw = 0.0;
    for (int j = 0; j < win; j++) pw += buf[j] * buf[j];
    power[t] = pw / win;

    cmndf_frame(buf, win, w, tau_max, fft_n, cm);

    auto& cv = cands[t];
    for (int tau = tau_min + 1; tau + 1 < tau_max; tau++) {
      if (cm[tau] < kCandThresh && cm[tau] <= cm[tau + 1] &&
          cm[tau] < cm[tau - 1]) {
        double val;
        const double tf = parabolic_refine(cm.data(), tau, 1, tau_max, &val);
        cv.push_back({tf, std::max(val, 0.0)});
      }
    }
    if (cv.empty()) {
      int gmin = tau_min;
      for (int tau = tau_min; tau < tau_max; tau++)
        if (cm[tau] < cm[gmin]) gmin = tau;
      double val;
      const double tf = parabolic_refine(cm.data(), gmin, 1, tau_max, &val);
      cv.push_back({tf, std::max(val, 0.0)});
    }
    std::sort(cv.begin(), cv.end(),
              [](const Cand& a, const Cand& b) { return a.cmndf < b.cmndf; });
    if ((int)cv.size() > kMaxCand) cv.resize(kMaxCand);
    best_cm[t] = cv[0].cmndf;
  }

  double max_pw = 1e-30;
  for (int t = 0; t < n_frames; t++) max_pw = std::max(max_pw, power[t]);

  // ---- pass 2: Viterbi over {candidates + UV} ---------------------------
  // state s in [0, kMaxCand) = candidate s; state kMaxCand = unvoiced.
  const int S = kMaxCand + 1;
  std::vector<double> cost((size_t)n_frames * S, 1e30);
  std::vector<int> back((size_t)n_frames * S, -1);
  auto emit = [&](int t, int s) -> double {
    const bool silent = power[t] < max_pw * kPowerGate;
    if (s == kMaxCand) return silent ? 0.0 : kUvBias * (1.0 - std::min(best_cm[t], 1.0));
    if (s >= (int)cands[t].size()) return 1e30;
    return cands[t][s].cmndf + (silent ? 10.0 : 0.0);
  };
  for (int s = 0; s < S; s++) cost[s] = emit(0, s);
  for (int t = 1; t < n_frames; t++) {
    for (int s = 0; s < S; s++) {
      const double e = emit(t, s);
      if (e >= 1e29) continue;
      double bc = 1e30;
      int bp = -1;
      for (int p = 0; p < S; p++) {
        const double pc = cost[(size_t)(t - 1) * S + p];
        if (pc >= 1e29) continue;
        double trans;
        if (p == kMaxCand && s == kMaxCand) {
          trans = 0.0;
        } else if (p == kMaxCand || s == kMaxCand) {
          trans = kSwitchCost;
        } else {
          const double fp = 1.0 / cands[t - 1][p].tau;
          const double fc = 1.0 / cands[t][s].tau;
          trans = kOctaveW * std::fabs(std::log2(fc / fp));
        }
        if (pc + trans < bc) {
          bc = pc + trans;
          bp = p;
        }
      }
      cost[(size_t)t * S + s] = bc + e;
      back[(size_t)t * S + s] = bp;
    }
  }
  std::vector<int> state(n_frames, kMaxCand);
  {
    int s = 0;
    for (int k = 1; k < S; k++)
      if (cost[(size_t)(n_frames - 1) * S + k] <
          cost[(size_t)(n_frames - 1) * S + s])
        s = k;
    for (int t = n_frames - 1; t >= 0; t--) {
      state[t] = s;
      if (t > 0) s = back[(size_t)t * S + s];
    }
  }

  // ---- pass 3: NCC refinement of the winning track ----------------------
  for (int t = 0; t < n_frames; t++) {
    if (state[t] == kMaxCand) {
      f0_out[t] = 0.0;
      continue;
    }
    extract(t, frame_buf.data());
    const double* buf = frame_buf.data();
    double ncc;
    const double tau =
        ncc_refine(buf, win, w, tau_max, cands[t][state[t]].tau, &ncc);
    f0_out[t] = (ncc >= kNccVeto && tau > 1.0) ? (double)fs / tau : 0.0;
    if (f0_out[t] < minf0 || f0_out[t] > maxf0) f0_out[t] = 0.0;
  }

  // ---- pass 4: track cleanup --------------------------------------------
  // 3-point median to kill residual single-frame spikes
  {
    std::vector<double> sm(f0_out, f0_out + n_frames);
    for (int t = 1; t + 1 < n_frames; t++) {
      const double a = sm[t - 1], b = sm[t], c = sm[t + 1];
      const double lo = std::min({a, b, c}), hi = std::max({a, b, c});
      f0_out[t] = a + b + c - lo - hi;
    }
  }
  // remove isolated voiced frames; bridge isolated unvoiced gaps
  for (int t = 1; t + 1 < n_frames; t++) {
    if (f0_out[t] > 0 && f0_out[t - 1] == 0 && f0_out[t + 1] == 0)
      f0_out[t] = 0.0;
    else if (f0_out[t] == 0 && f0_out[t - 1] > 0 && f0_out[t + 1] > 0)
      f0_out[t] = std::exp(0.5 * (std::log(f0_out[t - 1]) +
                                  std::log(f0_out[t + 1])));
  }
  return 0;
}

}  // namespace crankdsp
