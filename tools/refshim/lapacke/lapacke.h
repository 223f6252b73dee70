// Shim LAPACKE_dgesv (this image ships no LAPACKE): row-major partial-pivot
// Gaussian elimination, the textbook algorithm — mathematically the same
// factorization dgesv performs, written from scratch. Only the row-major
// single-call surface ldpc_lapack.cpp uses is provided.
#pragma once
#include <cmath>
#include <utility>

typedef int lapack_int;
#define LAPACK_ROW_MAJOR 101
#define LAPACK_COL_MAJOR 102

inline lapack_int LAPACKE_dgesv(int matrix_layout, lapack_int n,
                                lapack_int nrhs, double* a, lapack_int lda,
                                lapack_int* ipiv, double* b, lapack_int ldb) {
  if (matrix_layout != LAPACK_ROW_MAJOR) return -1;
  for (lapack_int k = 0; k < n; ++k) {
    lapack_int p = k;
    double mx = std::fabs(a[k * lda + k]);
    for (lapack_int i = k + 1; i < n; ++i) {
      double v = std::fabs(a[i * lda + k]);
      if (v > mx) { mx = v; p = i; }
    }
    if (mx == 0.0) return k + 1;  // singular: info > 0, like dgesv
    ipiv[k] = p + 1;
    if (p != k) {
      for (lapack_int j = 0; j < n; ++j)
        std::swap(a[k * lda + j], a[p * lda + j]);
      for (lapack_int r = 0; r < nrhs; ++r)
        std::swap(b[k * ldb + r], b[p * ldb + r]);
    }
    for (lapack_int i = k + 1; i < n; ++i) {
      double f = a[i * lda + k] / a[k * lda + k];
      a[i * lda + k] = f;
      for (lapack_int j = k + 1; j < n; ++j)
        a[i * lda + j] -= f * a[k * lda + j];
      for (lapack_int r = 0; r < nrhs; ++r)
        b[i * ldb + r] -= f * b[k * ldb + r];
    }
  }
  for (lapack_int i = n - 1; i >= 0; --i) {
    for (lapack_int r = 0; r < nrhs; ++r) {
      double s = b[i * ldb + r];
      for (lapack_int j = i + 1; j < n; ++j)
        s -= a[i * lda + j] * b[j * ldb + r];
      b[i * ldb + r] = s / a[i * lda + i];
    }
  }
  return 0;
}
