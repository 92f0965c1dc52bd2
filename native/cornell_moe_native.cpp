// cornell_moe_native: CPU reference kernels for the TPU-native framework.
//
// Role: an independent, dependency-free oracle for the test suite (the
// reference validates its C++ core against a pure-Python mirror; we invert
// that: the JAX/TPU path is primary and this C++ library is the trusted
// slow path), and a low-latency host fallback for tiny problems where
// device dispatch overhead dominates.
//
// Covers the numerics of the reference's gpp_linear_algebra /
// gpp_covariance / gpp_math / gpp_model_selection value paths: block
// covariance construction over (value + derivative-observation) channels,
// Cholesky factorization, triangular solves, GP posterior mean/variance,
// the zero-mean log marginal likelihood, and analytic 1,0-EI.
//
// All matrices are ROW-major, double precision.  Kernel derivative blocks
// use the (F0, P, Q) scalar-field formulation:
//   k00          = F0(s)
//   dk/dx_i      = -P(s) * t_i
//   d2k/dxi dyj  =  P(s) * delta_ij / l_i^2 - Q(s) * t_i * t_j
// with t_i = (x_i - y_i) / l_i^2 and s the squared scaled distance.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcornell_moe_native.so
//        cornell_moe_native.cpp

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kSqrt5 = 2.2360679774997896;
constexpr double kLog2Pi = 1.8378770664093453;

enum KernelType { kSquareExponential = 0, kMatern52 = 1 };

struct Fields {
  double f0;
  double p;
  double q;
};

// Scalar fields of the squared scaled distance s.
Fields kernel_fields(int kernel, double alpha, double s) {
  Fields out;
  if (kernel == kSquareExponential) {
    const double k = alpha * std::exp(-0.5 * s);
    out.f0 = k;
    out.p = k;
    out.q = k;
  } else {  // Matern 5/2
    const double r = std::sqrt(s);
    const double e = std::exp(-kSqrt5 * r);
    out.f0 = alpha * (1.0 + kSqrt5 * r + (5.0 / 3.0) * s) * e;
    out.p = (5.0 / 3.0) * alpha * (1.0 + kSqrt5 * r) * e;
    out.q = (25.0 / 3.0) * alpha * e;
  }
  return out;
}

}  // namespace

extern "C" {

// Block cross-covariance over (value + derivative) channels.
// hypers = [alpha, l_0..l_{dim-1}].  d1/d2 list derivative dims (may be
// null when m1/m2 == 0).  out is (n1*(1+m1)) x (n2*(1+m2)), row-major,
// point-major channel-minor — the reference layout (gpp_math.cpp:391-417).
void cm_build_block_covariance(int kernel, const double* hypers, int dim,
                               const double* x1, int n1, const int* d1,
                               int m1, const double* x2, int n2,
                               const int* d2, int m2, double* out) {
  const double alpha = hypers[0];
  const double* lengths = hypers + 1;
  const int c1 = 1 + m1, c2 = 1 + m2;
  const int cols = n2 * c2;
  std::vector<double> inv_l2(dim);
  for (int k = 0; k < dim; ++k) inv_l2[k] = 1.0 / (lengths[k] * lengths[k]);
  std::vector<double> t(dim);

  for (int i = 0; i < n1; ++i) {
    for (int j = 0; j < n2; ++j) {
      double s = 0.0;
      for (int k = 0; k < dim; ++k) {
        const double diff = x1[i * dim + k] - x2[j * dim + k];
        t[k] = diff * inv_l2[k];
        s += diff * t[k];
      }
      const Fields f = kernel_fields(kernel, alpha, s);
      double* block = out + (i * c1) * cols + j * c2;
      block[0] = f.f0;
      for (int b = 0; b < m2; ++b) block[1 + b] = f.p * t[d2[b]];
      for (int a = 0; a < m1; ++a) {
        double* row = block + (1 + a) * cols;
        row[0] = -f.p * t[d1[a]];
        for (int b = 0; b < m2; ++b) {
          const double delta =
              (d1[a] == d2[b]) ? f.p * inv_l2[d1[a]] : 0.0;
          row[1 + b] = delta - f.q * t[d1[a]] * t[d2[b]];
        }
      }
    }
  }
}

// In-place lower-Cholesky of a row-major SPD matrix.  Returns 0 on
// success or the 1-based leading minor index on failure
// (ComputeCholeskyFactorL counterpart, gpp_linear_algebra.hpp:157).
int cm_cholesky(double* a, int n) {
  for (int j = 0; j < n; ++j) {
    double diag = a[j * n + j];
    for (int k = 0; k < j; ++k) diag -= a[j * n + k] * a[j * n + k];
    if (diag <= 0.0 || !std::isfinite(diag)) return j + 1;
    diag = std::sqrt(diag);
    a[j * n + j] = diag;
    for (int i = j + 1; i < n; ++i) {
      double v = a[i * n + j];
      for (int k = 0; k < j; ++k) v -= a[i * n + k] * a[j * n + k];
      a[i * n + j] = v / diag;
    }
    for (int k = j + 1; k < n; ++k) a[j * n + k] = 0.0;
  }
  return 0;
}

// Solve L x = b (transpose=0) or L^T x = b (transpose=1) in place for
// nrhs right-hand sides stored column-contiguous as b[n][nrhs] row-major.
void cm_tri_solve(const double* lower, int n, double* b, int nrhs,
                  int transpose) {
  if (!transpose) {
    for (int i = 0; i < n; ++i) {
      for (int r = 0; r < nrhs; ++r) {
        double v = b[i * nrhs + r];
        for (int k = 0; k < i; ++k) v -= lower[i * n + k] * b[k * nrhs + r];
        b[i * nrhs + r] = v / lower[i * n + i];
      }
    }
  } else {
    for (int i = n - 1; i >= 0; --i) {
      for (int r = 0; r < nrhs; ++r) {
        double v = b[i * nrhs + r];
        for (int k = i + 1; k < n; ++k)
          v -= lower[k * n + i] * b[k * nrhs + r];
        b[i * nrhs + r] = v / lower[i * n + i];
      }
    }
  }
}

// Solve (L L^T) x = b in place (CholeskyFactorLMatrixVectorSolve).
void cm_chol_solve(const double* lower, int n, double* b, int nrhs) {
  cm_tri_solve(lower, n, b, nrhs, 0);
  cm_tri_solve(lower, n, b, nrhs, 1);
}

// GP posterior over value-only points_to_sample.
// y is (n, 1+m) row-major observation channels; noise is per channel.
// Prior mean = empirical mean of the value channel, subtracted from value
// channels (RecomputeDerivedVariables semantics, gpp_math.cpp:481-524).
// Outputs: mean_out (q), var_out (q, q).  Returns 0 or cholesky failure
// index.
int cm_gp_posterior(int kernel, const double* hypers, int dim,
                    const double* x, int n, const int* derivs, int m,
                    const double* noise, const double* y,
                    const double* xs, int q, double* mean_out,
                    double* var_out) {
  const int nch = n * (1 + m);
  std::vector<double> kmat(static_cast<size_t>(nch) * nch);
  cm_build_block_covariance(kernel, hypers, dim, x, n, derivs, m, x, n,
                            derivs, m, kmat.data());
  for (int i = 0; i < n; ++i)
    for (int c = 0; c <= m; ++c) {
      const int row = i * (1 + m) + c;
      kmat[static_cast<size_t>(row) * nch + row] += noise[c];
    }
  const int status = cm_cholesky(kmat.data(), nch);
  if (status != 0) return status;

  double mean = 0.0;
  for (int i = 0; i < n; ++i) mean += y[i * (1 + m)];
  mean /= n;
  std::vector<double> alpha(nch);
  for (int i = 0; i < n; ++i)
    for (int c = 0; c <= m; ++c)
      alpha[i * (1 + m) + c] = y[i * (1 + m) + c] - (c == 0 ? mean : 0.0);
  cm_chol_solve(kmat.data(), nch, alpha.data(), 1);

  std::vector<double> kstar(static_cast<size_t>(nch) * q);
  cm_build_block_covariance(kernel, hypers, dim, x, n, derivs, m, xs, q,
                            nullptr, 0, kstar.data());
  for (int j = 0; j < q; ++j) {
    double mu = mean;
    for (int r = 0; r < nch; ++r) mu += kstar[r * q + j] * alpha[r];
    mean_out[j] = mu;
  }
  // v = L^{-1} K*, var = K** - v^T v
  std::vector<double> v(kstar);
  cm_tri_solve(kmat.data(), nch, v.data(), q, 0);
  cm_build_block_covariance(kernel, hypers, dim, xs, q, nullptr, 0, xs, q,
                            nullptr, 0, var_out);
  for (int a = 0; a < q; ++a)
    for (int b = 0; b < q; ++b) {
      double dot = 0.0;
      for (int r = 0; r < nch; ++r) dot += v[r * q + a] * v[r * q + b];
      var_out[a * q + b] -= dot;
    }
  return 0;
}

// Zero-mean log marginal likelihood over all observation channels
// (LogMarginalLikelihoodEvaluator::ComputeLogLikelihood,
// gpp_model_selection.cpp:593-612).  Returns NaN on singular K.
double cm_log_marginal_likelihood(int kernel, const double* hypers,
                                  int dim, const double* x, int n,
                                  const int* derivs, int m,
                                  const double* noise, const double* y) {
  const int nch = n * (1 + m);
  std::vector<double> kmat(static_cast<size_t>(nch) * nch);
  cm_build_block_covariance(kernel, hypers, dim, x, n, derivs, m, x, n,
                            derivs, m, kmat.data());
  for (int i = 0; i < n; ++i)
    for (int c = 0; c <= m; ++c) {
      const int row = i * (1 + m) + c;
      kmat[static_cast<size_t>(row) * nch + row] += noise[c];
    }
  if (cm_cholesky(kmat.data(), nch) != 0)
    return std::nan("");
  std::vector<double> alpha(y, y + nch);
  cm_chol_solve(kmat.data(), nch, alpha.data(), 1);
  double data_fit = 0.0, log_det = 0.0;
  for (int r = 0; r < nch; ++r) {
    data_fit += y[r] * alpha[r];
    log_det += std::log(kmat[static_cast<size_t>(r) * nch + r]);
  }
  return -0.5 * data_fit - log_det - 0.5 * nch * kLog2Pi;
}

// Closed-form 1,0-EI (OnePotentialSampleExpectedImprovementEvaluator,
// gpp_math.cpp:2196-2259).
double cm_analytic_expected_improvement(double mu, double var,
                                        double best_so_far) {
  const double kMinStd = 1.0e-14;
  const double sigma = std::sqrt(var > kMinStd * kMinStd ? var
                                                         : kMinStd * kMinStd);
  const double u = (best_so_far - mu) / sigma;
  const double pdf = std::exp(-0.5 * u * u) / std::sqrt(2.0 * M_PI);
  const double cdf = 0.5 * std::erfc(-u / std::sqrt(2.0));
  return sigma * (u * cdf + pdf);
}

int cm_version() { return 1; }

}  // extern "C"
