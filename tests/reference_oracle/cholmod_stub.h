/* Minimal cholmod.h stand-in for compiling the reference libdogleg's DENSE
 * code paths as a test oracle on a machine without SuiteSparse. Types carry
 * exactly the fields the reference touches; every function aborts if called
 * (the dense paths never call CHOLMOD — cholmod_start is guarded by
 * solve_type == DOGLEG_SPARSE, reference dogleg.c:1697-1705).
 *
 * This is original stub code, not copied from SuiteSparse; field names
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
