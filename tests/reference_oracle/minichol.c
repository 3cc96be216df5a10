/* minichol: functional implementations for the CHOLMOD API subset the
 * reference libdogleg uses. See minichol.h for scope and semantics. */
#include "minichol.h"

#include <math.h>
#include <stdint.h>
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
    free((*F)->Lb);
    free((*F)->perm);
    free((*F)->iperm);
    free(*F);
    *F = NULL;
  }
  return 1;
}

/* ---- band path helpers (large n) ------------------------------------ */

#define MINICHOL_BAND_MIN_N 1024

static int cmp_u64(const void *x, const void *y) {
  uint64_t u = *(const uint64_t *)x, v = *(const uint64_t *)y;
  return u < v ? -1 : u > v;
}

/* Symmetric scalar adjacency (CSR, no diagonal, deduped) of the pattern
 * of A A^T: rows sharing a column of A are adjacent. Returns 0 on OOM. */
static int build_adjacency(const cholmod_sparse *A, int **out_p,
                           int **out_i) {
  const size_t n = A->nrow;
  const int *Ap = A->p;
  const int *Ai = A->i;
  size_t npairs = 0;
  for (size_t j = 0; j < A->ncol; j++) {
    const size_t len = (size_t)(Ap[j + 1] - Ap[j]);
    npairs += len * (len - 1); /* ordered pairs, both directions */
  }
  uint64_t *pairs = malloc((npairs ? npairs : 1) * sizeof(uint64_t));
  if (!pairs) return 0;
  size_t w = 0;
  for (size_t j = 0; j < A->ncol; j++)
    for (int a = Ap[j]; a < Ap[j + 1]; a++)
      for (int b = Ap[j]; b < Ap[j + 1]; b++)
        if (Ai[a] != Ai[b])
          pairs[w++] = ((uint64_t)(uint32_t)Ai[a] << 32)
                       | (uint32_t)Ai[b];
  qsort(pairs, w, sizeof(uint64_t), cmp_u64);
  size_t uniq = 0;
  for (size_t k = 0; k < w; k++)
    if (k == 0 || pairs[k] != pairs[k - 1]) pairs[uniq++] = pairs[k];
  int *adj_p = calloc(n + 1, sizeof(int));
  int *adj_i = malloc((uniq ? uniq : 1) * sizeof(int));
  if (!adj_p || !adj_i) { free(pairs); free(adj_p); free(adj_i); return 0; }
  for (size_t k = 0; k < uniq; k++) adj_p[(pairs[k] >> 32) + 1]++;
  for (size_t r = 0; r < n; r++) adj_p[r + 1] += adj_p[r];
  for (size_t k = 0; k < uniq; k++) adj_i[k] = (int)(uint32_t)pairs[k];
  free(pairs);
  *out_p = adj_p;
  *out_i = adj_i;
  return 1;
}

/* One BFS from seed appending into queue[*count..]; marks vis; returns a
 * min-degree node of the deepest level (pseudo-peripheral sweep). */
static int rcm_bfs_far(const int *Ap, const int *Ai, unsigned char *vis,
                       int *queue, size_t *count, int seed) {
  size_t head = *count, tail = *count, level_start = *count;
  queue[tail++] = seed;
  vis[seed] = 1;
  int last_best = seed;
  while (head < tail) {
    size_t level_end = tail;
    last_best = queue[level_start];
    for (size_t q = level_start; q < level_end; q++) {
      int v = queue[q];
      if (Ap[v + 1] - Ap[v]
          < Ap[last_best + 1] - Ap[last_best])
        last_best = v;
    }
    for (; head < level_end; head++) {
      int u = queue[head];
      for (int a = Ap[u]; a < Ap[u + 1]; a++)
        if (!vis[Ai[a]]) { vis[Ai[a]] = 1; queue[tail++] = Ai[a]; }
    }
    level_start = level_end;
  }
  *count = tail;
  return last_best;
}

/* Reverse Cuthill-McKee: BFS from a pseudo-peripheral node per component,
 * neighbors visited in increasing-degree order, final order reversed.
 * perm[new] = old. */
static void rcm_order(size_t n, const int *Ap, const int *Ai, int *perm) {
  unsigned char *vis = calloc(n ? n : 1, 1);
  int *queue = malloc((n ? n : 1) * sizeof(int));
  size_t count = 0;

  for (size_t s = 0; s < n; s++) {
    if (vis[s]) continue;
    /* pseudo-peripheral seed: one sweep to the far side */
    size_t mark = count;
    int seed = rcm_bfs_far(Ap, Ai, vis, queue, &count, (int)s);
    for (size_t k = mark; k < count; k++) vis[queue[k]] = 0;
    count = mark;
    /* final CM BFS with degree-sorted neighbor insertion */
    size_t head = count;
    queue[count++] = seed;
    vis[seed] = 1;
    while (head < count) {
      int u = queue[head++];
      size_t first = count;
      for (int a = Ap[u]; a < Ap[u + 1]; a++)
        if (!vis[Ai[a]]) { vis[Ai[a]] = 1; queue[count++] = Ai[a]; }
      /* insertion-sort the freshly appended neighbors by degree */
      for (size_t x = first + 1; x < count; x++) {
        int v = queue[x];
        const int dv = Ap[v + 1] - Ap[v];
        size_t y = x;
        while (y > first
               && Ap[queue[y - 1] + 1] - Ap[queue[y - 1]] > dv) {
          queue[y] = queue[y - 1];
          y--;
        }
        queue[y] = v;
      }
    }
  }
  for (size_t k = 0; k < n; k++) perm[k] = queue[n - 1 - k]; /* reverse */
  free(vis);
  free(queue);
}

static int minichol_factorize_band(const cholmod_sparse *A, double beta,
                                   cholmod_factor *F, cholmod_common *cc) {
  const size_t n = F->n;
  const int bw = F->bw;
  const size_t ldb = (size_t)bw + 1;
  const int *Ap = A->p;
  const int *Ai = A->i;
  const double *Ax = A->x;
  double *Lb = F->Lb;
  memset(Lb, 0, n * ldb * sizeof(double));

  /* band assembly of P (A A^T) P^T */
  for (size_t j = 0; j < A->ncol; j++)
    for (int a = Ap[j]; a < Ap[j + 1]; a++) {
      const int ra = F->iperm[Ai[a]];
      const double va = Ax[a];
      for (int b = Ap[j]; b < Ap[j + 1]; b++) {
        const int rb = F->iperm[Ai[b]];
        if (rb <= ra) {
          if (ra - rb > bw) { cc->status = 1; return 0; } /* new pattern */
          Lb[(size_t)ra * ldb + (size_t)(ra - rb)] += va * Ax[b];
        }
      }
    }
  for (size_t k = 0; k < n; k++) Lb[k * ldb] += beta;

  /* in-place banded Cholesky (lower, row-major band storage) */
  F->minor = n;
  for (size_t k = 0; k < n; k++) {
    const size_t jmin = k > (size_t)bw ? k - (size_t)bw : 0;
    for (size_t j = jmin; j < k; j++) {
      double s = Lb[k * ldb + (k - j)];
      const size_t tmin = jmin; /* t >= k-bw implies t >= j-bw here */
      for (size_t t = tmin; t < j; t++)
        s -= Lb[k * ldb + (k - t)] * Lb[j * ldb + (j - t)];
      Lb[k * ldb + (k - j)] = s / Lb[j * ldb];
    }
    double s = Lb[k * ldb];
    for (size_t t = jmin; t < k; t++) {
      const double v = Lb[k * ldb + (k - t)];
      s -= v * v;
    }
    if (!(s > 0.0) || !isfinite(s)) {
      F->minor = k;
      cc->status = 1;
      return 1; /* CHOLMOD_NOT_POSDEF behavior: success, minor < n */
    }
    Lb[k * ldb] = sqrt(s);
  }
  cc->status = 0;
  return 1;
}

static void minichol_solve_vec_band(const cholmod_factor *F,
                                    const double *b, double *out) {
  const size_t n = F->n;
  const int bw = F->bw;
  const size_t ldb = (size_t)bw + 1;
  const double *Lb = F->Lb;
  double *y = malloc(n * sizeof(double));
  for (size_t k = 0; k < n; k++) y[k] = b[F->perm[k]];
  for (size_t k = 0; k < n; k++) {
    double s = y[k];
    const size_t jmin = k > (size_t)bw ? k - (size_t)bw : 0;
    for (size_t j = jmin; j < k; j++)
      s -= Lb[k * ldb + (k - j)] * y[j];
    y[k] = s / Lb[k * ldb];
  }
  for (size_t k = n; k-- > 0;) {
    double s = y[k];
    const size_t jmax = k + (size_t)bw < n - 1 ? k + (size_t)bw : n - 1;
    for (size_t j = k + 1; j <= jmax; j++)
      s -= Lb[j * ldb + (j - k)] * y[j];
    y[k] = s / Lb[k * ldb];
  }
  for (size_t k = 0; k < n; k++) out[F->perm[k]] = y[k];
  free(y);
}

cholmod_factor *cholmod_analyze(cholmod_sparse *A, cholmod_common *cc) {
  (void)cc;
  cholmod_factor *F = calloc(1, sizeof *F);
  if (!F) return NULL;
  F->n = A->nrow;
  F->minor = A->nrow;
  if (A->nrow > MINICHOL_BAND_MIN_N) {
    /* band path: RCM on the pattern of A A^T, banded factor storage */
    int *adj_p, *adj_i;
    if (build_adjacency(A, &adj_p, &adj_i)) {
      const size_t n = A->nrow;
      F->perm = malloc(n * sizeof(int));
      F->iperm = malloc(n * sizeof(int));
      if (F->perm && F->iperm) {
        rcm_order(n, adj_p, adj_i, F->perm);
        for (size_t k = 0; k < n; k++) F->iperm[F->perm[k]] = (int)k;
        int bw = 0;
        for (size_t u = 0; u < n; u++)
          for (int a = adj_p[u]; a < adj_p[u + 1]; a++) {
            int d = F->iperm[u] - F->iperm[adj_i[a]];
            if (d < 0) d = -d;
            if (d > bw) bw = d;
          }
        F->bw = bw;
        F->Lb = malloc(n * ((size_t)bw + 1) * sizeof(double));
        if (F->Lb) F->is_band = 1;
      }
      free(adj_p);
      free(adj_i);
    }
    if (F->is_band) return F;
    free(F->perm); free(F->iperm); free(F->Lb);
    F->perm = F->iperm = NULL; F->Lb = NULL;
  }
  F->L = malloc((A->nrow > 0 ? A->nrow * A->nrow : 1)
                * sizeof(double));
  if (!F->L) { free(F); return NULL; }
  return F;
}

/* L L^T = A A^T + beta I, natural ordering, left-looking, in F->L
 * (row-major lower). On a non-positive pivot at column k: minor = k,
 * status nonzero, still returns success (CHOLMOD_NOT_POSDEF behavior —
 * the reference checks minor, dogleg.c:667). */
static int minichol_factorize_band(const cholmod_sparse *A, double beta,
                                   cholmod_factor *F, cholmod_common *cc);

static int minichol_factorize(const cholmod_sparse *A, double beta,
                              cholmod_factor *F, cholmod_common *cc) {
  if (F->is_band) return minichol_factorize_band(A, beta, F, cc);
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

static void minichol_solve_vec_band(const cholmod_factor *F,
                                    const double *b, double *out);

/* forward/back substitution: L L^T out = b */
static void minichol_solve_vec(const cholmod_factor *F, const double *b,
                               double *out) {
  if (F->is_band) { minichol_solve_vec_band(F, b, out); return; }
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
