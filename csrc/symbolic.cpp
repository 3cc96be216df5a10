// Native symbolic-analysis kernels for libdogleg_tpu.
//
// The structure-only (symbolic) phase of the block-sparse pipeline — block
// pattern derivation from scalar CSR, and the sorted JtJ pair schedule — is
// pointer-chasing graph work executed once per problem structure on the
// host. It is the TPU-native counterpart of the reference's one-time
// cholmod_analyze (reference dogleg.c:649-654), and like CHOLMOD's, it
// belongs in native code: for large patterns (1e5+ block rows) the
// pure-numpy fallback in sparsity.py is orders of magnitude slower.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this toolchain).
// All index arrays are int32 (matching BCSRStructure) with int64 counts.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// JtJ pair schedule: for every ordered pair (a, b) of stored blocks that
// share a block row, one output contribution at block (indices[a],
// indices[b]). Returns pairs sorted by output block (so each output tile is
// a contiguous accumulation run) with a dense rank per distinct output
// block. Two-phase: call jtj_pair_count first to size the buffers.

int64_t jtj_pair_count(const int32_t* indptr, int32_t nbrow) {
  int64_t total = 0;
  for (int32_t r = 0; r < nbrow; ++r) {
    const int64_t k = indptr[r + 1] - indptr[r];
    total += k * k;
  }
  return total;
}

struct PairRec {
  int32_t ci, cj, pi, pj;
};

int64_t jtj_schedule(const int32_t* indptr, const int32_t* indices,
                     int32_t nbrow, int32_t nbcol,
                     // outputs, sized by jtj_pair_count():
                     int32_t* pair_i, int32_t* pair_j, int32_t* out_idx,
                     // outputs, sized by jtj_pair_count() (upper bound on
                     // distinct blocks); returns the actual count:
                     int32_t* out_ci, int32_t* out_cj) {
  const int64_t npairs = jtj_pair_count(indptr, nbrow);
  std::vector<PairRec> recs;
  recs.reserve(static_cast<size_t>(npairs));
  for (int32_t r = 0; r < nbrow; ++r) {
    for (int32_t a = indptr[r]; a < indptr[r + 1]; ++a) {
      for (int32_t b = indptr[r]; b < indptr[r + 1]; ++b) {
        recs.push_back(PairRec{indices[a], indices[b], a, b});
      }
    }
  }
  std::sort(recs.begin(), recs.end(),
            [](const PairRec& x, const PairRec& y) {
              if (x.ci != y.ci) return x.ci < y.ci;
              if (x.cj != y.cj) return x.cj < y.cj;
              if (x.pi != y.pi) return x.pi < y.pi;
              return x.pj < y.pj;
            });
  int64_t nblocks = 0;
  for (int64_t p = 0; p < npairs; ++p) {
    const PairRec& rec = recs[static_cast<size_t>(p)];
    if (p == 0 || rec.ci != recs[static_cast<size_t>(p - 1)].ci ||
        rec.cj != recs[static_cast<size_t>(p - 1)].cj) {
      out_ci[nblocks] = rec.ci;
      out_cj[nblocks] = rec.cj;
      ++nblocks;
    }
    pair_i[p] = rec.pi;
    pair_j[p] = rec.pj;
    out_idx[p] = static_cast<int32_t>(nblocks - 1);
  }
  (void)nbcol;
  return nblocks;
}

// ---------------------------------------------------------------------
// Block pattern from a scalar CSR pattern (the reference's Jt layout,
// dogleg.h:11-20): block (br, bc) is stored iff any scalar nnz falls in it.
// Two-phase: first call fills indptr and returns nnzb; second fills indices.

int64_t bcsr_block_pattern(const int64_t* rowptr, const int32_t* colidx,
                           int32_t nmeas, int32_t nstate,
                           int32_t block_rows, int32_t block_cols,
                           // outputs:
                           int32_t* indptr,        // (nbrow + 1)
                           int32_t* indices_or_null) {
  const int32_t nbrow = nmeas / block_rows;
  std::vector<int32_t> cols;
  int64_t nnzb = 0;
  indptr[0] = 0;
  for (int32_t br = 0; br < nbrow; ++br) {
    cols.clear();
    const int64_t lo = rowptr[static_cast<int64_t>(br) * block_rows];
    const int64_t hi = rowptr[static_cast<int64_t>(br + 1) * block_rows];
    for (int64_t k = lo; k < hi; ++k) {
      cols.push_back(colidx[k] / block_cols);
    }
    std::sort(cols.begin(), cols.end());
    cols.erase(std::unique(cols.begin(), cols.end()), cols.end());
    if (indices_or_null != nullptr) {
      std::memcpy(indices_or_null + nnzb, cols.data(),
                  cols.size() * sizeof(int32_t));
    }
    nnzb += static_cast<int64_t>(cols.size());
    indptr[br + 1] = static_cast<int32_t>(nnzb);
  }
  (void)nstate;
  return nnzb;
}

}  // extern "C"
