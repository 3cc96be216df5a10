/* Aborting definitions for the cholmod stub: the oracle build only
 * exercises the reference's dense paths, which never call CHOLMOD. */
#include "cholmod_stub.h"

#include <stdio.h>
#include <stdlib.h>

#define STUB_ABORT()                                                     \
  do {                                                                   \
    fprintf(stderr, "cholmod stub called from a sparse path: %s\n",      \
            __func__);                                                   \
    abort();                                                             \
  } while (0)

int cholmod_start(cholmod_common *cc) { (void)cc; STUB_ABORT(); }
int cholmod_finish(cholmod_common *cc) { (void)cc; STUB_ABORT(); }
cholmod_factor *cholmod_analyze(cholmod_sparse *a, cholmod_common *cc) {
  (void)a; (void)cc; STUB_ABORT();
}
int cholmod_factorize(cholmod_sparse *a, cholmod_factor *f,
                      cholmod_common *cc) {
  (void)a; (void)f; (void)cc; STUB_ABORT();
}
int cholmod_factorize_p(cholmod_sparse *a, double *beta, int *fset,
                        size_t fsize, cholmod_factor *f,
                        cholmod_common *cc) {
  (void)a; (void)beta; (void)fset; (void)fsize; (void)f; (void)cc;
  STUB_ABORT();
}
cholmod_dense *cholmod_solve(int sys, cholmod_factor *f, cholmod_dense *b,
                             cholmod_common *cc) {
  (void)sys; (void)f; (void)b; (void)cc; STUB_ABORT();
}
cholmod_sparse *cholmod_spsolve(int sys, cholmod_factor *f,
                                cholmod_sparse *b, cholmod_common *cc) {
  (void)sys; (void)f; (void)b; (void)cc; STUB_ABORT();
}
cholmod_sparse *cholmod_allocate_sparse(size_t nrow, size_t ncol,
                                        size_t nzmax, int sorted, int packed,
                                        int stype, int xtype,
                                        cholmod_common *cc) {
  (void)nrow; (void)ncol; (void)nzmax; (void)sorted; (void)packed;
  (void)stype; (void)xtype; (void)cc; STUB_ABORT();
}
cholmod_dense *cholmod_allocate_dense(size_t nrow, size_t ncol, size_t d,
                                      int xtype, cholmod_common *cc) {
  (void)nrow; (void)ncol; (void)d; (void)xtype; (void)cc; STUB_ABORT();
}
int cholmod_free_sparse(cholmod_sparse **a, cholmod_common *cc) {
  (void)a; (void)cc; STUB_ABORT();
}
int cholmod_free_dense(cholmod_dense **a, cholmod_common *cc) {
  (void)a; (void)cc; STUB_ABORT();
}
int cholmod_free_factor(cholmod_factor **f, cholmod_common *cc) {
  (void)f; (void)cc; STUB_ABORT();
}
