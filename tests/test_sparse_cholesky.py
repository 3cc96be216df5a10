"""Block-sparse Cholesky (the CHOLMOD replacement) vs dense oracles, and an
end-to-end solve through the driver with SparseNewtonSolver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libdogleg_tpu import DoglegParameters, solve_products
from libdogleg_tpu.ops.newton import SparseNewtonSolver
from libdogleg_tpu.solver import Products
from libdogleg_tpu import sparse_cholesky as sc


def _random_spd_pattern(seed, nb, b, extra_offdiag):
    """A random sparse SPD block matrix: its dense form, stored lower blocks,
    and the pattern coordinate lists."""
    rng = np.random.default_rng(seed)
    n = nb * b
    # sparse symmetric pattern: diagonal + random strictly-lower blocks
    pairs = {(j, j) for j in range(nb)}
    while len(pairs) < nb + extra_offdiag:
        i = rng.integers(1, nb)
        j = rng.integers(0, i)
        pairs.add((int(i), int(j)))
    rows, cols = map(np.asarray, zip(*sorted(pairs, key=lambda t: (t[1],
                                                                   t[0]))))
    dense = np.zeros((n, n))
    blocks = []
    for i, j in zip(rows, cols):
        blk = rng.normal(size=(b, b))
        if i == j:
            blk = blk @ blk.T + b * np.eye(b) * (2 + nb * 0.5)
        else:
            blk = blk * 0.3
        dense[i * b:(i + 1) * b, j * b:(j + 1) * b] = blk
        if i != j:
            dense[j * b:(j + 1) * b, i * b:(i + 1) * b] = blk.T
        blocks.append(blk)
    # ensure SPD
    w = np.linalg.eigvalsh(dense)
    assert w.min() > 0, "test matrix not SPD; adjust construction"
    return dense, jnp.asarray(np.stack(blocks)), rows, cols


@pytest.mark.parametrize("nb,b,extra", [(8, 1, 10), (8, 3, 10), (12, 2, 20),
                                        (5, 4, 6)])
def test_factorization_matches_dense(nb, b, extra):
    dense, blocks, rows, cols = _random_spd_pattern(0, nb, b, extra)
    sym = sc.analyze(rows, cols, nb, b)
    L, ok = sc.factorize(sym, blocks, jnp.asarray(0.0))
    assert bool(ok)
    # reassemble L and check L L^T == dense
    n = nb * b
    Lfull = np.zeros((n, n))
    for k in range(sym.nslots):
        i, j = int(sym.rows[k]), int(sym.cols[k])
        Lfull[i * b:(i + 1) * b, j * b:(j + 1) * b] = np.asarray(L[k])
    # zero strict upper of diagonal blocks
    Lfull = np.tril(Lfull)
    np.testing.assert_allclose(Lfull @ Lfull.T, dense, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("nb,b,extra", [(8, 1, 10), (10, 3, 18)])
def test_solve_matches_dense(nb, b, extra):
    dense, blocks, rows, cols = _random_spd_pattern(1, nb, b, extra)
    sym = sc.analyze(rows, cols, nb, b)
    L, ok = sc.factorize(sym, blocks, jnp.asarray(0.0))
    assert bool(ok)
    rhs = jnp.asarray(np.random.default_rng(2).normal(size=(nb * b,)))
    x = sc.solve(sym, L, rhs)
    np.testing.assert_allclose(dense @ np.asarray(x), np.asarray(rhs),
                               rtol=1e-8, atol=1e-10)


def test_lambda_escalation_on_singular():
    dense, blocks, rows, cols = _random_spd_pattern(3, 6, 2, 8)
    # zero out one diagonal block -> singular
    kill = 2
    idx = [k for k, (i, j) in enumerate(zip(rows, cols))
           if i == j == kill][0]
    blocks = blocks.at[idx].set(jnp.zeros((2, 2)))
    sym = sc.analyze(rows, cols, 6, 2)
    L, lam, ok = sc.factorize_with_lambda(sym, blocks, jnp.asarray(0.0))
    assert bool(ok) and float(lam) > 0


def test_jittable():
    dense, blocks, rows, cols = _random_spd_pattern(4, 8, 2, 12)
    sym = sc.analyze(rows, cols, 8, 2)
    rhs = jnp.asarray(np.random.default_rng(5).normal(size=(16,)))

    @jax.jit
    def f(blocks, rhs):
        L, ok = sc.factorize(sym, blocks, jnp.asarray(0.0))
        return sc.solve(sym, L, rhs), ok

    x, ok = f(blocks, rhs)
    assert bool(ok)
    np.testing.assert_allclose(dense @ np.asarray(x), np.asarray(rhs),
                               rtol=1e-8, atol=1e-10)


def test_sparse_newton_end_to_end():
    """A sparse nonlinear problem solved through the trust-region driver
    with the block-sparse factorization: chain of coupled oscillators
    (tridiagonal block JtJ)."""
    nb, b = 10, 2
    n = nb * b
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.normal(size=(n,)))
    # residuals: r_i = p_i - target_i (diag) and coupling
    # r2_k = 0.3*(p_blk[k] - p_blk[k+1]) -> tridiagonal block JtJ
    rows = list(range(nb)) + list(range(1, nb))
    cols = list(range(nb)) + list(range(0, nb - 1))
    rows, cols = np.asarray(rows), np.asarray(cols)
    order = np.lexsort((rows, cols))
    rows, cols = rows[order], cols[order]
    ns = SparseNewtonSolver.analyze(rows, cols, nb, b)

    def products(p):
        pb = p.reshape(nb, b)
        r1 = p - target
        d = pb[:-1] - pb[1:]
        r2 = 0.3 * d.reshape(-1)
        norm2_x = jnp.dot(r1, r1) + jnp.dot(r2, r2)
        # gradient
        g = r1.reshape(nb, b)
        g = g.at[:-1].add(0.3 * 0.3 * d)
        g = g.at[1:].add(-0.3 * 0.3 * d)
        # JtJ blocks on the tridiagonal pattern
        eye = jnp.eye(b)
        diag = jnp.stack([eye * (1 + 0.09 * ((0 < k) + (k < nb - 1)))
                          for k in range(nb)])
        off = jnp.stack([-0.09 * eye for _ in range(nb - 1)])
        blocks_map = {}
        for k in range(nb):
            blocks_map[(k, k)] = diag[k]
        for k in range(nb - 1):
            blocks_map[(k + 1, k)] = off[k]
        blocks = jnp.stack([blocks_map[(int(i), int(j))]
                            for i, j in zip(rows, cols)])
        return Products(norm2_x=norm2_x, Jt_x=g.reshape(-1), JtJ=blocks)

    r = solve_products(products, jnp.zeros(n), DoglegParameters(),
                       newton_solver=ns)
    # quadratic problem: one GN step to optimum; optimum solves
    # (I + 0.09 D^T D) p = target
    assert int(r.step_count) <= 2
    # verify gradient is ~0 at solution
    assert float(jnp.max(jnp.abs(r.Jt_x))) < 1e-10
