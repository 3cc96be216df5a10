"""Pallas block-sparse kernels vs the XLA reference path (interpret mode on
the CPU test backend; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libdogleg_tpu.ops import bcsr as bops
from libdogleg_tpu.ops.pallas_bcsr import (bcsr_jtj_blocks_pallas,
                                           bcsr_jtj_dense_pallas,
                                           bcsr_matvec_pallas,
                                           build_jtj_schedule,
                                           jtj_blocks_to_dense,
                                           supports_pallas)


def _block_sparse(seed, nbrow=5, nbcol=4, bm=8, bn=128, density=0.5):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(nbrow, nbcol)) < density
    mask[:, 0] = True
    indptr = np.zeros(nbrow + 1, np.int32)
    cols = []
    for r in range(nbrow):
        c = np.nonzero(mask[r])[0].astype(np.int32)
        cols.append(c)
        indptr[r + 1] = indptr[r] + len(c)
    s = bops.BCSRStructure(nmeas=nbrow * bm, nstate=nbcol * bn,
                           block_rows=bm, block_cols=bn,
                           indptr=indptr, indices=np.concatenate(cols))
    values = jnp.asarray(rng.normal(size=(s.nnzb, bm, bn)), jnp.float32)
    return bops.BCSRJacobian(structure=s, values=values)


def test_schedule_is_sorted_and_complete():
    J = _block_sparse(0)
    sched = build_jtj_schedule(J.structure)
    keys = sched.out_idx
    assert np.all(np.diff(keys) >= 0)  # contiguous runs
    # every same-row pair appears exactly once
    pi, pj = J.structure.jtj_pairs()
    assert len(sched.pair_i) == len(pi)


def test_jtj_blocks_match_xla_path():
    J = _block_sparse(1)
    blocks, sched = bcsr_jtj_blocks_pallas(J, interpret=True)
    dense_pallas = jtj_blocks_to_dense(blocks, sched, J.structure)
    dense_xla = bops.bcsr_jtj_dense(J)
    np.testing.assert_allclose(np.asarray(dense_pallas),
                               np.asarray(dense_xla), rtol=1e-5, atol=1e-3)


def test_jtj_dense_wrapper():
    J = _block_sparse(2, nbrow=3, nbcol=2)
    dense = np.asarray(bops.bcsr_to_dense(J), np.float64)
    got = bcsr_jtj_dense_pallas(J, interpret=True)
    np.testing.assert_allclose(np.asarray(got), dense.T @ dense,
                               rtol=1e-4, atol=1e-2)


def test_matvec_matches_xla_path():
    J = _block_sparse(3)
    v = jnp.asarray(
        np.random.default_rng(4).normal(size=(J.structure.nstate,)),
        jnp.float32)
    got = bcsr_matvec_pallas(J, v, interpret=True)
    ref = bops.bcsr_matvec(J, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_supports_pallas_gate():
    assert supports_pallas(_block_sparse(5).structure)
    tiny = _block_sparse(6, bm=2, bn=3)
    assert not supports_pallas(tiny.structure)


def test_pallas_cholesky_matches_lax():
    from libdogleg_tpu.ops.pallas_chol import (pallas_cholesky,
                                               pallas_tri_solve_right)
    rng = np.random.default_rng(0)
    k, n = 4, 32
    A = rng.normal(size=(k, n, n)).astype(np.float32)
    spd = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                      + n * np.eye(n, dtype=np.float32))
    L, ok = pallas_cholesky(spd)
    assert bool(np.asarray(ok).all())
    np.testing.assert_allclose(np.asarray(L),
                               np.linalg.cholesky(np.asarray(spd)),
                               rtol=1e-4, atol=1e-4)
    C = jnp.asarray(rng.normal(size=(k, 16, n)).astype(np.float32))
    X = pallas_tri_solve_right(L, C)
    np.testing.assert_allclose(
        np.einsum('kmn,kjn->kmj', np.asarray(X), np.asarray(L)),
        np.asarray(C), rtol=1e-4, atol=1e-4)
