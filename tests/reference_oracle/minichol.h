/* minichol: a small FUNCTIONAL stand-in for the subset of the CHOLMOD API
 * that the reference libdogleg uses, so the reference's SPARSE code paths
 * (dogleg_optimize2, the sparse outlierness trace, the sparse gradient
 * checker) can actually execute as a test oracle on a machine without
 * SuiteSparse (no network, no system package — see PARITY.md).
 *
 * Semantics implemented (matching how dogleg.c calls CHOLMOD):
 *  - cholmod_analyze/factorize[_p] on an stype=0 CSC matrix A computes the
 *    Cholesky factorization  L L^T = A A^T + beta[0] I  (reference
 *    dogleg.c:649-677 passes Jt, so this is JtJ + lambda I).
 *  - rank deficiency is reported via factor->minor < factor->n, which is
 *    exactly what the reference's lambda-escalation loop checks
 *    (dogleg.c:667-676); the call still returns success, as CHOLMOD does.
 *  - cholmod_solve/spsolve with CHOLMOD_A solve (A A^T + beta I) x = b.
 *  - spsolve returns a fully-populated sorted packed CSC result (a legal
 *    sparse matrix; the reference only iterates it in row order,
 *    dogleg.c:2876-2888).
 *
 * Differences from real CHOLMOD, by design: for oracle-sized problems
 * (n <= 1024), natural ordering and a dense factor representation —
 * numerics are correct double-precision Cholesky, differing from
 * SuiteSparse only in summation order (ulp-level), and bit-stable across
 * edits (the parity tests pin against this path). For larger n (the
 * config-6-scale head-to-head benchmarks) an RCM-ordered BANDED
 * simplicial factorization is used: O(n bw^2) time / O(n bw) memory —
 * a classical CSparse-class method, typically within a small factor of
 * CHOLMOD's simplicial mode on grid-structured problems but slower than
 * its supernodal+AMD/ND mode; benchmark JSON rows that time this path
 * say so.
 *
 * This is original code, not copied from SuiteSparse; type/field names
 * follow the public CHOLMOD API so the reference compiles unmodified.
 */
#pragma once
#include <stddef.h>

#define CHOLMOD_VER_CODE(main, sub) ((main)*1000 + (sub))
/* pretend to be an old CHOLMOD so dogleg.c uses the plain
 * cc->print_function redirect (dogleg.c:1603-1604) */
#define CHOLMOD_VERSION CHOLMOD_VER_CODE(2, 2)

#define CHOLMOD_A 0
#define CHOLMOD_INT 0
#define CHOLMOD_REAL 1
#define CHOLMOD_DOUBLE 0

typedef struct {
  size_t nrow, ncol, nzmax;
  void *p, *i, *nz, *x, *z;
  int stype, itype, xtype, dtype, sorted, packed;
} cholmod_sparse;

typedef struct {
  size_t nrow, ncol, nzmax, d;
  void *x, *z;
  int xtype, dtype;
} cholmod_dense;

typedef struct {
  size_t n, minor;
  /* implementation details (never touched by dogleg.c). Two paths:
   *  - dense (n <= MINICHOL_BAND_MIN_N): L is the factor, dense
   *    row-major lower-triangular, n*n — bit-identical to the original
   *    oracle, used by all parity tests;
   *  - band (large n): an RCM-permuted banded factor, the
   *    benchmark-grade simplicial path. Lb[k*(bw+1)+d] = L[k][k-d] of
   *    the factorization of P (A A^T + beta I) P^T; perm[new] = old. */
  double *L;
  int is_band;
  int bw;
  double *Lb;
  int *perm, *iperm;
} cholmod_factor;

typedef struct {
  int supernodal;
  int (*print_function)(const char *, ...);
  int status;
} cholmod_common;

#ifdef __cplusplus
extern "C" {
#endif

int cholmod_start(cholmod_common *);
int cholmod_finish(cholmod_common *);
cholmod_factor *cholmod_analyze(cholmod_sparse *, cholmod_common *);
int cholmod_factorize(cholmod_sparse *, cholmod_factor *, cholmod_common *);
int cholmod_factorize_p(cholmod_sparse *, double *, int *, size_t,
                        cholmod_factor *, cholmod_common *);
cholmod_dense *cholmod_solve(int, cholmod_factor *, cholmod_dense *,
                             cholmod_common *);
cholmod_sparse *cholmod_spsolve(int, cholmod_factor *, cholmod_sparse *,
                                cholmod_common *);
cholmod_sparse *cholmod_allocate_sparse(size_t, size_t, size_t, int, int,
                                        int, int, cholmod_common *);
cholmod_dense *cholmod_allocate_dense(size_t, size_t, size_t, int,
                                      cholmod_common *);
int cholmod_free_sparse(cholmod_sparse **, cholmod_common *);
int cholmod_free_dense(cholmod_dense **, cholmod_common *);
int cholmod_free_factor(cholmod_factor **, cholmod_common *);

#ifdef __cplusplus
}
#endif
