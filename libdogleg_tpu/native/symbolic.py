"""ctypes wrappers over the native symbolic-analysis kernels, with numpy
signatures identical to the pure-Python versions they accelerate."""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from libdogleg_tpu.native.loader import get_lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def jtj_schedule_native(indptr: np.ndarray, indices: np.ndarray,
                        nbcol: int) -> Optional[Tuple[np.ndarray, ...]]:
    """Sorted JtJ pair schedule (pair_i, pair_j, out_idx, out_ci, out_cj),
    identical to pallas_bcsr.build_jtj_schedule's numpy output. None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    nbrow = len(indptr) - 1
    npairs = lib.jtj_pair_count(_i32p(indptr), nbrow)
    pair_i = np.empty(npairs, np.int32)
    pair_j = np.empty(npairs, np.int32)
    out_idx = np.empty(npairs, np.int32)
    out_ci = np.empty(max(npairs, 1), np.int32)
    out_cj = np.empty(max(npairs, 1), np.int32)
    nblocks = lib.jtj_schedule(_i32p(indptr), _i32p(indices), nbrow,
                               int(nbcol), _i32p(pair_i), _i32p(pair_j),
                               _i32p(out_idx), _i32p(out_ci), _i32p(out_cj))
    return (pair_i, pair_j, out_idx,
            out_ci[:nblocks].copy(), out_cj[:nblocks].copy())


def bcsr_pattern_native(rowptr: np.ndarray, colidx: np.ndarray,
                        nmeas: int, nstate: int,
                        block_rows: int, block_cols: int
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(indptr, indices) block pattern from a scalar CSR pattern; None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int64)
    colidx = np.ascontiguousarray(colidx, np.int32)
    nbrow = nmeas // block_rows
    indptr = np.empty(nbrow + 1, np.int32)
    null = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    nnzb = lib.bcsr_block_pattern(_i64p(rowptr), _i32p(colidx), nmeas,
                                  nstate, block_rows, block_cols,
                                  _i32p(indptr), null)
    indices = np.empty(nnzb, np.int32)
    lib.bcsr_block_pattern(_i64p(rowptr), _i32p(colidx), nmeas, nstate,
                           block_rows, block_cols, _i32p(indptr),
                           _i32p(indices))
    return indptr, indices
