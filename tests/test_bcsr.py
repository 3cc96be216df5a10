"""Block-CSR structure and product tests against dense numpy oracles."""

import jax.numpy as jnp
import numpy as np

from libdogleg_tpu.ops import bcsr as bops
from libdogleg_tpu.sparsity import bcsr_from_scalar_csr, dense_structure


def _random_block_sparse(seed, nbrow=6, nbcol=5, bm=4, bn=3, density=0.4):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(nbrow, nbcol)) < density
    mask[:, 0] = True  # ensure no empty block-rows/cols for a sane problem
    mask[0, :] = True
    indptr = np.zeros(nbrow + 1, np.int32)
    indices = []
    for r in range(nbrow):
        cols = np.nonzero(mask[r])[0]
        indices.append(cols.astype(np.int32))
        indptr[r + 1] = indptr[r] + len(cols)
    s = bops.BCSRStructure(nmeas=nbrow * bm, nstate=nbcol * bn,
                           block_rows=bm, block_cols=bn,
                           indptr=indptr, indices=np.concatenate(indices))
    values = jnp.asarray(rng.normal(size=(s.nnzb, bm, bn)))
    return bops.BCSRJacobian(structure=s, values=values)


def test_roundtrip_dense():
    J = _random_block_sparse(0)
    dense = bops.bcsr_to_dense(J)
    vals2 = bops.dense_to_bcsr_values(dense, J.structure)
    np.testing.assert_allclose(vals2, J.values, rtol=1e-15)


def test_jt_x_matches_dense():
    J = _random_block_sparse(1)
    dense = np.asarray(bops.bcsr_to_dense(J))
    x = np.random.default_rng(2).normal(size=(J.structure.nmeas,))
    np.testing.assert_allclose(bops.bcsr_jt_x(J, jnp.asarray(x)),
                               dense.T @ x, rtol=1e-12)


def test_matvec_matches_dense():
    J = _random_block_sparse(3)
    dense = np.asarray(bops.bcsr_to_dense(J))
    v = np.random.default_rng(4).normal(size=(J.structure.nstate,))
    np.testing.assert_allclose(bops.bcsr_matvec(J, jnp.asarray(v)),
                               dense @ v, rtol=1e-12)


def test_jtj_matches_dense():
    J = _random_block_sparse(5)
    dense = np.asarray(bops.bcsr_to_dense(J))
    np.testing.assert_allclose(bops.bcsr_jtj_dense(J), dense.T @ dense,
                               rtol=1e-11, atol=1e-12)


def test_structure_from_scalar_csr():
    """Scalar CSR pattern (the reference's Jt layout, sample.c:89-125)
    coarsens to the right block pattern."""
    # 4 measurements, 6 states; meas 0,1 touch states {0,1}, meas 2,3 touch
    # states {4,5}
    rowptr = np.array([0, 2, 4, 6, 8])
    colidx = np.array([0, 1, 0, 1, 4, 5, 4, 5])
    s = bcsr_from_scalar_csr(rowptr, colidx, nmeas=4, nstate=6,
                             block_rows=2, block_cols=2)
    assert s.nnzb == 2
    np.testing.assert_array_equal(s.indices, [0, 2])
    np.testing.assert_array_equal(s.indptr, [0, 1, 2])


def test_dense_structure_stores_everything():
    s = dense_structure(8, 6, block_rows=4, block_cols=3)
    assert s.nnzb == 2 * 2
    assert s.nbrow == 2 and s.nbcol == 2


def test_jtj_lower_blocks_match_dense():
    """The block-sparse lower-triangle JtJ equals the lower blocks of the
    dense JtJ oracle, in the schedule's (rows, cols) order."""
    J = _random_block_sparse(5)
    s = J.structure
    sched = bops.jtj_lower_schedule(s)
    blocks = np.asarray(bops.bcsr_jtj_lower_blocks(J, sched))
    dense = np.asarray(bops.bcsr_to_dense(J))
    JtJ = dense.T @ dense
    bn = s.block_cols
    assert np.all(sched.rows >= sched.cols)
    for k in range(sched.rows.shape[0]):
        i, j = int(sched.rows[k]), int(sched.cols[k])
        np.testing.assert_allclose(
            blocks[k], JtJ[i * bn:(i + 1) * bn, j * bn:(j + 1) * bn],
            rtol=1e-12, atol=1e-12)


def test_sparse_jtj_mode_end_to_end():
    """SparseProblem(jtj='sparse') — block-sparse JtJ through the
    level-scheduled Cholesky — takes the same trajectory as jtj='dense' on a
    nonlinear block-banded problem."""
    import jax
    from libdogleg_tpu import DoglegParameters, optimize
    from libdogleg_tpu.problems import SparseProblem

    nbcol, bn, bm = 6, 2, 4
    nstate = nbcol * bn
    nbrow = nbcol
    nmeas = nbrow * bm
    rng = np.random.default_rng(8)
    # block-banded M: blocks (r, r) and (r, r+1)
    indptr, indices, mblocks = [0], [], []
    for r in range(nbrow):
        cols = [r] + ([r + 1] if r + 1 < nbcol else [])
        indices.extend(cols)
        indptr.append(len(indices))
        for _ in cols:
            mblocks.append(rng.normal(size=(bm, bn)))
    s = bops.BCSRStructure(nmeas=nmeas, nstate=nstate, block_rows=bm,
                           block_cols=bn,
                           indptr=np.asarray(indptr, np.int32),
                           indices=np.asarray(indices, np.int32))
    M = jnp.asarray(np.stack(mblocks))
    col_of_block = jnp.asarray(s.indices)
    target = jnp.asarray(rng.normal(size=(nmeas,)))

    M_dense = jnp.asarray(np.asarray(
        bops.bcsr_to_dense(bops.BCSRJacobian(structure=s, values=M))))

    def f2(p):
        # residuals M g(p) - target with g elementwise nonlinear;
        # J blocks = M_block * g'(p segment) broadcast over block rows
        g = p + 0.3 * jnp.sin(p)
        gp = (1.0 + 0.3 * jnp.cos(p)).reshape(nbcol, bn)
        x = M_dense @ g - target
        values = M * gp[col_of_block][:, None, :]
        return x, values

    prm = DoglegParameters()
    p0 = jnp.asarray(rng.normal(size=(nstate,)) * 0.5)
    r_dense = optimize(SparseProblem(f=f2, structure=s), p0, prm)
    r_sparse = jax.jit(lambda q: optimize(
        SparseProblem(f=f2, structure=s, jtj="sparse"), q, prm))(p0)
    assert int(r_sparse.step_count) == int(r_dense.step_count)
    np.testing.assert_allclose(np.asarray(r_sparse.p),
                               np.asarray(r_dense.p), rtol=1e-8, atol=1e-9)
    assert float(jnp.max(jnp.abs(r_sparse.Jt_x))) < 1e-7
