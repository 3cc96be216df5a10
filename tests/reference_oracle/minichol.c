/* minichol: functional implementations for the CHOLMOD API subset the
 * reference libdogleg uses. See minichol.h for scope and semantics. */
#include "minichol.h"

#include <math.h>
#include <stdlib.h>
#include <string.h>

int cholmod_start(cholmod_common *cc) {
  cc->status = 0;
  return 1;
}

int cholmod_finish(cholmod_common *cc) {
  (void)cc;
  return 1;
}

cholmod_sparse *cholmod_allocate_sparse(size_t nrow, size_t ncol,
                                        size_t nzmax, int sorted, int packed,
                                        int stype, int xtype,
                                        cholmod_common *cc) {
  (void)cc;
  cholmod_sparse *A = calloc(1, sizeof *A);
  if (!A) return NULL;
  A->nrow = nrow;
  A->ncol = ncol;
  A->nzmax = nzmax;
  A->p = calloc(ncol + 1, sizeof(int));
  A->i = calloc(nzmax > 0 ? nzmax : 1, sizeof(int));
  A->x = calloc(nzmax > 0 ? nzmax : 1, sizeof(double));
  A->sorted = sorted;
  A->packed = packed;
  A->stype = stype;
  A->itype = CHOLMOD_INT;
  A->xtype = xtype;
  A->dtype = CHOLMOD_DOUBLE;
  if (!A->p || !A->i || !A->x) {
    free(A->p); free(A->i); free(A->x); free(A);
    return NULL;
  }
  return A;
}

cholmod_dense *cholmod_allocate_dense(size_t nrow, size_t ncol, size_t d,
                                      int xtype, cholmod_common *cc) {
  (void)cc;
  cholmod_dense *X = calloc(1, sizeof *X);
  if (!X) return NULL;
  X->nrow = nrow;
  X->ncol = ncol;
  X->nzmax = d * ncol;
  X->d = d;
  X->x = calloc(d * ncol > 0 ? d * ncol : 1, sizeof(double));
  X->xtype = xtype;
  X->dtype = CHOLMOD_DOUBLE;
  if (!X->x) { free(X); return NULL; }
  return X;
}

int cholmod_free_sparse(cholmod_sparse **A, cholmod_common *cc) {
  (void)cc;
  if (A && *A) {
    free((*A)->p);
    free((*A)->i);
    free((*A)->x);
    free(*A);
    *A = NULL;
  }
  return 1;
}

int cholmod_free_dense(cholmod_dense **X, cholmod_common *cc) {
  (void)cc;
  if (X && *X) {
    free((*X)->x);
    free(*X);
    *X = NULL;
  }
  return 1;
}

int cholmod_free_factor(cholmod_factor **F, cholmod_common *cc) {
  (void)cc;
  if (F && *F) {
    free((*F)->L);
    free(*F);
    *F = NULL;
  }
  return 1;
}

cholmod_factor *cholmod_analyze(cholmod_sparse *A, cholmod_common *cc) {
  (void)cc;
  cholmod_factor *F = calloc(1, sizeof *F);
  if (!F) return NULL;
  F->n = A->nrow;
  F->minor = A->nrow;
  F->L = malloc((A->nrow > 0 ? A->nrow * A->nrow : 1)
                * sizeof(double));
  if (!F->L) { free(F); return NULL; }
  return F;
}

/* L L^T = A A^T + beta I, natural ordering, left-looking, in F->L
 * (row-major lower). On a non-positive pivot at column k: minor = k,
 * status nonzero, still returns success (CHOLMOD_NOT_POSDEF behavior —
 * the reference checks minor, dogleg.c:667). */
static int minichol_factorize(const cholmod_sparse *A, double beta,
                              cholmod_factor *F, cholmod_common *cc) {
  const size_t n = F->n;
  const int *Ap = A->p;
  const int *Ai = A->i;
  const double *Ax = A->x;
  double *C = calloc(n > 0 ? n * n : 1, sizeof(double));
  if (!C) return 0;

  /* C = A A^T (lower triangle), one rank-1 update per column of A */
  for (size_t j = 0; j < A->ncol; j++)
    for (int a = Ap[j]; a < Ap[j + 1]; a++) {
      const int ra = Ai[a];
      const double va = Ax[a];
      for (int b = Ap[j]; b < Ap[j + 1]; b++) {
        const int rb = Ai[b];
        if (rb <= ra) C[(size_t)ra * n + rb] += va * Ax[b];
      }
    }
  for (size_t k = 0; k < n; k++) C[k * n + k] += beta;

  double *L = F->L;
  memset(L, 0, n * n * sizeof(double));
  F->minor = n;
  for (size_t k = 0; k < n; k++) {
    double s = C[k * n + k];
    for (size_t j = 0; j < k; j++) s -= L[k * n + j] * L[k * n + j];
    if (!(s > 0.0) || !isfinite(s)) {
      F->minor = k;
      cc->status = 1; /* not positive definite */
      free(C);
      return 1;
    }
    const double lkk = sqrt(s);
    L[k * n + k] = lkk;
    for (size_t r = k + 1; r < n; r++) {
      double t = C[r * n + k];
      for (size_t j = 0; j < k; j++) t -= L[r * n + j] * L[k * n + j];
      L[r * n + k] = t / lkk;
    }
  }
  cc->status = 0;
  free(C);
  return 1;
}

int cholmod_factorize(cholmod_sparse *A, cholmod_factor *F,
                      cholmod_common *cc) {
  return minichol_factorize(A, 0.0, F, cc);
}

int cholmod_factorize_p(cholmod_sparse *A, double *beta, int *fset,
                        size_t fsize, cholmod_factor *F,
                        cholmod_common *cc) {
  (void)fset;
  (void)fsize; /* dogleg.c always passes NULL, 0 (dogleg.c:663) */
  return minichol_factorize(A, beta[0], F, cc);
}

/* forward/back substitution: L L^T out = b */
static void minichol_solve_vec(const cholmod_factor *F, const double *b,
                               double *out) {
  const size_t n = F->n;
  const double *L = F->L;
  for (size_t k = 0; k < n; k++) {
    double s = b[k];
    for (size_t j = 0; j < k; j++) s -= L[k * n + j] * out[j];
    out[k] = s / L[k * n + k];
  }
  for (size_t k = n; k-- > 0;) {
    double s = out[k];
    for (size_t j = k + 1; j < n; j++) s -= L[j * n + k] * out[j];
    out[k] = s / L[k * n + k];
  }
}

cholmod_dense *cholmod_solve(int sys, cholmod_factor *F, cholmod_dense *B,
                             cholmod_common *cc) {
  if (sys != CHOLMOD_A || B->nrow != F->n) return NULL;
  cholmod_dense *X =
      cholmod_allocate_dense(B->nrow, B->ncol, B->nrow, CHOLMOD_REAL, cc);
  if (!X) return NULL;
  for (size_t c = 0; c < B->ncol; c++)
    minichol_solve_vec(F, (const double *)B->x + c * B->d,
                       (double *)X->x + c * X->d);
  return X;
}

cholmod_sparse *cholmod_spsolve(int sys, cholmod_factor *F,
                                cholmod_sparse *B, cholmod_common *cc) {
  if (sys != CHOLMOD_A || B->nrow != F->n) return NULL;
  const size_t n = F->n;
  cholmod_sparse *X = cholmod_allocate_sparse(n, B->ncol, n * B->ncol, 1, 1,
                                              0, CHOLMOD_REAL, cc);
  if (!X) return NULL;
  double *work = calloc(n > 0 ? n : 1, sizeof(double));
  if (!work) { cholmod_free_sparse(&X, cc); return NULL; }
  int *Xp = X->p;
  int *Xi = X->i;
  double *Xx = X->x;
  const int *Bp = B->p;
  const int *Bi = B->i;
  const double *Bx = B->x;
  for (size_t c = 0; c < B->ncol; c++) {
    memset(work, 0, n * sizeof(double));
    for (int a = Bp[c]; a < Bp[c + 1]; a++) work[Bi[a]] = Bx[a];
    minichol_solve_vec(F, work, Xx + c * n);
    for (size_t r = 0; r < n; r++) Xi[c * n + r] = (int)r;
    Xp[c + 1] = (int)((c + 1) * n);
  }
  free(work);
  return X;
}
