// Minimal standard-behavior stand-in for the slice of UMFPACK that
// /root/reference/apps/ldpc_umfpack.cpp uses (this image has no
// SuiteSparse). Written from scratch against the documented UMFPACK
// interface: COO->CSC conversion plus a solve of the 8x8 GF(2)-derived
// system, implemented densely (dense partial-pivot Gaussian elimination
// is mathematically the same factorization; the "sparse" distinction is
// a performance concern UMFPACK exists for, immaterial at n = 8).
#pragma once
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <utility>

#define UMFPACK_OK 0
#define UMFPACK_ERROR_invalid_matrix (-8)
#define UMFPACK_A 0

struct umf_shim_symbolic { int n; };
struct umf_shim_numeric { int n; double* a; };  // densified column-major-agnostic copy

static inline int umfpack_di_triplet_to_col(int n_row, int n_col, int nz,
                                            const int* Ti, const int* Tj,
                                            const double* Tx, int* Ap,
                                            int* Ai, double* Ax,
                                            void* /*map*/) {
  if (n_row < 0 || n_col < 0 || nz < 0) return UMFPACK_ERROR_invalid_matrix;
  for (int j = 0; j <= n_col; ++j) Ap[j] = 0;
  for (int k = 0; k < nz; ++k) {
    if (Ti[k] < 0 || Ti[k] >= n_row || Tj[k] < 0 || Tj[k] >= n_col)
      return UMFPACK_ERROR_invalid_matrix;
    ++Ap[Tj[k] + 1];
  }
  for (int j = 0; j < n_col; ++j) Ap[j + 1] += Ap[j];
  int* next = new int[n_col];
  for (int j = 0; j < n_col; ++j) next[j] = Ap[j];
  for (int k = 0; k < nz; ++k) {
    int p = next[Tj[k]]++;
    Ai[p] = Ti[k];
    Ax[p] = Tx[k];
  }
  delete[] next;
  return UMFPACK_OK;
}

static inline int umfpack_di_symbolic(int n_row, int n_col, const int*,
                                      const int*, const double*,
                                      void** Symbolic, const double*,
                                      double*) {
  if (n_row != n_col || n_row <= 0) return UMFPACK_ERROR_invalid_matrix;
  umf_shim_symbolic* s = new umf_shim_symbolic;
  s->n = n_row;
  *Symbolic = s;
  return UMFPACK_OK;
}

static inline int umfpack_di_numeric(const int* Ap, const int* Ai,
                                     const double* Ax, void* Symbolic,
                                     void** Numeric, const double*,
                                     double*) {
  umf_shim_symbolic* s = static_cast<umf_shim_symbolic*>(Symbolic);
  int n = s->n;
  umf_shim_numeric* num = new umf_shim_numeric;
  num->n = n;
  num->a = new double[(size_t)n * n];
  std::memset(num->a, 0, sizeof(double) * (size_t)n * n);
  for (int j = 0; j < n; ++j)
    for (int p = Ap[j]; p < Ap[j + 1]; ++p)
      num->a[(size_t)Ai[p] * n + j] += Ax[p];   // duplicates sum, per spec
  *Numeric = num;
  return UMFPACK_OK;
}

static inline void umfpack_di_free_symbolic(void** Symbolic) {
  delete static_cast<umf_shim_symbolic*>(*Symbolic);
  *Symbolic = nullptr;
}

static inline void umfpack_di_free_numeric(void** Numeric) {
  umf_shim_numeric* num = static_cast<umf_shim_numeric*>(*Numeric);
  delete[] num->a;
  delete num;
  *Numeric = nullptr;
}

static inline int umfpack_di_solve(int sys, const int*, const int*,
                                   const double*, double* X,
                                   const double* B, void* Numeric,
                                   const double*, double*) {
  if (sys != UMFPACK_A) return UMFPACK_ERROR_invalid_matrix;
  umf_shim_numeric* num = static_cast<umf_shim_numeric*>(Numeric);
  int n = num->n;
  double* a = new double[(size_t)n * n];
  std::memcpy(a, num->a, sizeof(double) * (size_t)n * n);
  for (int i = 0; i < n; ++i) X[i] = B[i];
  for (int k = 0; k < n; ++k) {               // partial-pivot GE
    int p = k;
    double mx = std::fabs(a[(size_t)k * n + k]);
    for (int i = k + 1; i < n; ++i) {
      double v = std::fabs(a[(size_t)i * n + k]);
      if (v > mx) { mx = v; p = i; }
    }
    if (mx == 0.0) { delete[] a; return UMFPACK_ERROR_invalid_matrix; }
    if (p != k) {
      for (int j = 0; j < n; ++j)
        std::swap(a[(size_t)k * n + j], a[(size_t)p * n + j]);
      std::swap(X[k], X[p]);
    }
    for (int i = k + 1; i < n; ++i) {
      double f = a[(size_t)i * n + k] / a[(size_t)k * n + k];
      for (int j = k + 1; j < n; ++j)
        a[(size_t)i * n + j] -= f * a[(size_t)k * n + j];
      X[i] -= f * X[k];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    for (int j = i + 1; j < n; ++j) X[i] -= a[(size_t)i * n + j] * X[j];
    X[i] /= a[(size_t)i * n + i];
  }
  delete[] a;
  return UMFPACK_OK;
}
