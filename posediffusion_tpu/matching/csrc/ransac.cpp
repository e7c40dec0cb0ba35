// Two-view geometric verification: fundamental-matrix RANSAC.
//
// Native replacement for the reference's pycolmap
// ``estimation_and_geometric_verification`` step
// (reference: pose_diffusion/util/match_extraction.py:125-130; SURVEY.md N2):
// given putative correspondences from the matcher, robustly fit F with the
// normalized 8-point algorithm and classify inliers by Sampson distance.
//
// Self-contained C++17, no external deps: small fixed-size linear algebra
// (Jacobi eigensolver for the 9x9 normal matrix, closed-form 3x3 SVD via
// Jacobi on F^T F) keeps the hot loop allocation-free.  Exposed with a C ABI
// for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libransac.so ransac.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>

namespace {

// ---------------------------------------------------------------- linalg

// Jacobi eigen-decomposition of a symmetric n x n matrix (n <= 9).
// A is overwritten; V receives eigenvectors (columns); d eigenvalues.
void jacobi_eigen(double* A, int n, double* V, double* d) {
  for (int i = 0; i < n * n; ++i) V[i] = 0.0;
  for (int i = 0; i < n; ++i) V[i * n + i] = 1.0;

  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < n; ++p)
      for (int q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
    if (off < 1e-24) break;

    for (int p = 0; p < n; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-30) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double tau = (aqq - app) / (2.0 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) /
                   (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
        double c = 1.0 / std::sqrt(1.0 + t * t);
        double s = t * c;

        for (int k = 0; k < n; ++k) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - s * akq;
          A[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - s * aqk;
          A[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - s * vkq;
          V[k * n + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < n; ++i) d[i] = A[i * n + i];
}

// Eigenvector of the smallest eigenvalue of symmetric n x n M -> out[n].
void smallest_eigenvector(const double* M, int n, double* out) {
  double A[81], V[81], d[9];
  std::memcpy(A, M, sizeof(double) * n * n);
  jacobi_eigen(A, n, V, d);
  int best = 0;
  for (int i = 1; i < n; ++i)
    if (d[i] < d[best]) best = i;
  for (int i = 0; i < n; ++i) out[i] = V[i * n + best];
}

// Enforce rank 2 on a 3x3 matrix: F <- U diag(s1, s2, 0) V^T.
// Uses eigen-decompositions of F^T F (right side) and F F^T (left side).
void enforce_rank2(double* F) {
  double FtF[9] = {0}, FFt[9] = {0};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k) {
        FtF[i * 3 + j] += F[k * 3 + i] * F[k * 3 + j];
        FFt[i * 3 + j] += F[i * 3 + k] * F[j * 3 + k];
      }
  double Vr[9], dr[3], Ar[9];
  std::memcpy(Ar, FtF, sizeof(FtF));
  jacobi_eigen(Ar, 3, Vr, dr);
  // sort eigenpairs descending
  int idx[3] = {0, 1, 2};
  std::sort(idx, idx + 3, [&](int a, int b) { return dr[a] > dr[b]; });

  double s[3];
  double U[9];
  for (int c = 0; c < 3; ++c) {
    int e = idx[c];
    s[c] = dr[e] > 0 ? std::sqrt(dr[e]) : 0.0;
    // u_c = F v_c / s_c (for nonzero s)
    double u[3] = {0, 0, 0};
    for (int i = 0; i < 3; ++i)
      for (int k = 0; k < 3; ++k) u[i] += F[i * 3 + k] * Vr[k * 3 + e];
    double norm = std::sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2]);
    if (norm > 1e-12)
      for (int i = 0; i < 3; ++i) u[i] /= norm;
    for (int i = 0; i < 3; ++i) U[i * 3 + c] = u[i];
  }
  // F = s1 u1 v1^T + s2 u2 v2^T  (drop the smallest singular value)
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0.0;
      for (int c = 0; c < 2; ++c)
        acc += s[c] * U[i * 3 + c] * Vr[j * 3 + idx[c]];
      F[i * 3 + j] = acc;
    }
}

// ------------------------------------------------------------- estimation

struct NormXform {
  double cx, cy, scale;
};

NormXform normalize_points(const float* pts, const int* sample, int m,
                           double* out /* 2*m */) {
  double cx = 0, cy = 0;
  for (int i = 0; i < m; ++i) {
    cx += pts[2 * sample[i]];
    cy += pts[2 * sample[i] + 1];
  }
  cx /= m;
  cy /= m;
  double dist = 0;
  for (int i = 0; i < m; ++i) {
    double dx = pts[2 * sample[i]] - cx, dy = pts[2 * sample[i] + 1] - cy;
    dist += std::sqrt(dx * dx + dy * dy);
  }
  dist /= m;
  double scale = dist > 1e-12 ? std::sqrt(2.0) / dist : 1.0;
  for (int i = 0; i < m; ++i) {
    out[2 * i] = (pts[2 * sample[i]] - cx) * scale;
    out[2 * i + 1] = (pts[2 * sample[i] + 1] - cy) * scale;
  }
  return {cx, cy, scale};
}

// Fit F (p2^T F p1 = 0) from m >= 8 correspondences (normalized 8-point).
bool fit_fundamental(const float* kp1, const float* kp2, const int* sample,
                     int m, double* F) {
  double p1[2 * 64], p2[2 * 64];
  if (m > 64) m = 64;
  NormXform t1 = normalize_points(kp1, sample, m, p1);
  NormXform t2 = normalize_points(kp2, sample, m, p2);

  // normal matrix AtA of the m x 9 design matrix
  double AtA[81] = {0};
  for (int i = 0; i < m; ++i) {
    double x1 = p1[2 * i], y1 = p1[2 * i + 1];
    double x2 = p2[2 * i], y2 = p2[2 * i + 1];
    double row[9] = {x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, 1.0};
    for (int a = 0; a < 9; ++a)
      for (int b = 0; b < 9; ++b) AtA[a * 9 + b] += row[a] * row[b];
  }
  double f[9];
  smallest_eigenvector(AtA, 9, f);

  double Fn[9];
  std::memcpy(Fn, f, sizeof(Fn));
  enforce_rank2(Fn);

  // denormalize: F = T2^T Fn T1, with T = [[s,0,-s*cx],[0,s,-s*cy],[0,0,1]]
  double T1[9] = {t1.scale, 0, -t1.scale * t1.cx,
                  0, t1.scale, -t1.scale * t1.cy, 0, 0, 1};
  double T2[9] = {t2.scale, 0, -t2.scale * t2.cx,
                  0, t2.scale, -t2.scale * t2.cy, 0, 0, 1};
  double tmp[9] = {0};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k)
        tmp[i * 3 + j] += T2[k * 3 + i] * Fn[k * 3 + j];  // T2^T Fn
  std::memset(F, 0, sizeof(double) * 9);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k) F[i * 3 + j] += tmp[i * 3 + k] * T1[k * 3 + j];
  return true;
}

inline double sampson(const double* F, double x1, double y1, double x2,
                      double y2) {
  double Fx1[3] = {F[0] * x1 + F[1] * y1 + F[2], F[3] * x1 + F[4] * y1 + F[5],
                   F[6] * x1 + F[7] * y1 + F[8]};
  double Ftx2[3] = {F[0] * x2 + F[3] * y2 + F[6], F[1] * x2 + F[4] * y2 + F[7],
                    F[2] * x2 + F[5] * y2 + F[8]};
  double num = x2 * Fx1[0] + y2 * Fx1[1] + Fx1[2];
  double den = Fx1[0] * Fx1[0] + Fx1[1] * Fx1[1] + Ftx2[0] * Ftx2[0] +
               Ftx2[1] * Ftx2[1];
  return num * num / std::max(den, 1e-12);
}

}  // namespace

extern "C" {

// RANSAC fundamental-matrix verification.
//   kp1, kp2: (n, 2) float32 pixel coordinates of putative matches
//   threshold: inlier Sampson distance in px^2-comparable units (COLMAP's
//              default max_error=4px corresponds to threshold 16)
//   confidence: early-exit confidence (e.g. 0.9999)
//   F_out: row-major 3x3 (p2^T F p1 = 0); inlier_mask: n bytes
// Returns the inlier count (0 if degenerate / n < 8).
int ransac_fundamental(const float* kp1, const float* kp2, int n,
                       float threshold, int max_iters, double confidence,
                       uint64_t seed, double* F_out, uint8_t* inlier_mask) {
  std::memset(inlier_mask, 0, n);
  std::memset(F_out, 0, sizeof(double) * 9);
  if (n < 8) return 0;

  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> pick(0, n - 1);

  int best_count = 0;
  double bestF[9] = {0};
  int iters = max_iters;

  for (int it = 0; it < iters; ++it) {
    int sample[8];
    for (int i = 0; i < 8; ++i) {
      bool dup;
      do {
        sample[i] = pick(rng);
        dup = false;
        for (int j = 0; j < i; ++j) dup |= (sample[j] == sample[i]);
      } while (dup);
    }
    double F[9];
    if (!fit_fundamental(kp1, kp2, sample, 8, F)) continue;

    int count = 0;
    for (int i = 0; i < n; ++i) {
      double d = sampson(F, kp1[2 * i], kp1[2 * i + 1], kp2[2 * i],
                         kp2[2 * i + 1]);
      if (d < threshold) ++count;
    }
    if (count > best_count) {
      best_count = count;
      std::memcpy(bestF, F, sizeof(bestF));
      // adaptive iteration count; the ratio can reach ~1e13 for weak models,
      // so clamp in double BEFORE the int cast (overflow wraps negative and
      // would truncate the loop right after the first bad model)
      double w = static_cast<double>(count) / n;
      double p_outlier = 1.0 - std::pow(w, 8);
      p_outlier = std::min(std::max(p_outlier, 1e-12), 1.0 - 1e-12);
      double needed_d =
          std::ceil(std::log(1.0 - confidence) / std::log(p_outlier));
      int needed = needed_d >= static_cast<double>(max_iters)
                       ? max_iters
                       : static_cast<int>(needed_d);
      iters = std::min(max_iters, std::max(needed, it + 1));
    }
  }

  if (best_count < 8) return 0;

  // local optimization: refit on all inliers of the best model, once.
  int* inliers = new int[best_count];
  int m = 0;
  for (int i = 0; i < n; ++i) {
    if (sampson(bestF, kp1[2 * i], kp1[2 * i + 1], kp2[2 * i],
                kp2[2 * i + 1]) < threshold)
      inliers[m++] = i;
  }
  double F_refit[9];
  if (fit_fundamental(kp1, kp2, inliers, m, F_refit)) {
    int count = 0;
    for (int i = 0; i < n; ++i) {
      if (sampson(F_refit, kp1[2 * i], kp1[2 * i + 1], kp2[2 * i],
                  kp2[2 * i + 1]) < threshold)
        ++count;
    }
    if (count >= best_count) {
      best_count = count;
      std::memcpy(bestF, F_refit, sizeof(bestF));
    }
  }
  delete[] inliers;

  int count = 0;
  for (int i = 0; i < n; ++i) {
    bool in = sampson(bestF, kp1[2 * i], kp1[2 * i + 1], kp2[2 * i],
                      kp2[2 * i + 1]) < threshold;
    inlier_mask[i] = in ? 1 : 0;
    count += in;
  }
  std::memcpy(F_out, bestF, sizeof(bestF));
  return count;
}

}  // extern "C"
