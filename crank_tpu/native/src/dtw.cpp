// Dynamic time warping with Euclidean frame distance.
//
// Role parity: fastdtw in the reference's MCD evaluation
// (crank/bin/evaluate_mcd.py:70-73).  Exact O(N*M) DP (the sequences are
// utterance-length, a few thousand frames, so exact DTW is affordable and
// strictly more accurate than fastdtw's approximation).
#include <algorithm>
#include <cmath>
#include <limits>
#include <vector>

namespace crankdsp {

extern "C" int crank_dtw(const double* a, int n, const double* b, int m,
                         int dim, int* path_a, int* path_b) {
  // returns path length; path arrays must have capacity n + m
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> cost((size_t)(n + 1) * (m + 1), INF);
  auto C = [&](int i, int j) -> double& {
    return cost[(size_t)i * (m + 1) + j];
  };
  C(0, 0) = 0.0;
  for (int i = 1; i <= n; i++) {
    const double* ai = a + (size_t)(i - 1) * dim;
    for (int j = 1; j <= m; j++) {
      const double* bj = b + (size_t)(j - 1) * dim;
      double d = 0.0;
      for (int k = 0; k < dim; k++) {
        const double diff = ai[k] - bj[k];
        d += diff * diff;
      }
      d = std::sqrt(d);
      const double best = std::min({C(i - 1, j), C(i, j - 1), C(i - 1, j - 1)});
      C(i, j) = d + best;
    }
  }
  // backtrack
  std::vector<int> pa, pb;
  int i = n, j = m;
  while (i > 0 && j > 0) {
    pa.push_back(i - 1);
    pb.push_back(j - 1);
    const double diag = C(i - 1, j - 1), up = C(i - 1, j), left = C(i, j - 1);
    if (diag <= up && diag <= left) {
      i--;
      j--;
    } else if (up <= left) {
      i--;
    } else {
      j--;
    }
  }
  while (i > 0) { pa.push_back(--i); pb.push_back(0); }
  while (j > 0) { pa.push_back(0); pb.push_back(--j); }
  const int len = (int)pa.size();
  for (int k = 0; k < len; k++) {
    path_a[k] = pa[len - 1 - k];
    path_b[k] = pb[len - 1 - k];
  }
  return len;
}

}  // namespace crankdsp
