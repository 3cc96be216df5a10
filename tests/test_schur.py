"""Schur-complement Newton backend vs dense oracle, and an end-to-end
BA-style solve through the trust-region driver (BASELINE.md config 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libdogleg_tpu import DoglegParameters, solve_products
from libdogleg_tpu.ops.newton import (DenseNewtonSolver, SchurJtJ,
                                      SchurNewtonSolver, schur_to_dense)
from libdogleg_tpu.solver import Products

NC, NP, BS = 5, 12, 3


def _random_schur(seed, spd=True):
    rng = np.random.default_rng(seed)
    n = NC + NP * BS
    J = rng.normal(size=(3 * n, n))  # overdetermined -> SPD JtJ
    JtJ = J.T @ J
    U = jnp.asarray(JtJ[:NC, :NC])
    W = jnp.asarray(JtJ[:NC, NC:].reshape(NC, NP, BS))
    V = jnp.asarray(np.stack([
        JtJ[NC + i * BS:NC + (i + 1) * BS, NC + i * BS:NC + (i + 1) * BS]
        for i in range(NP)]))
    # zero the off-diagonal point-point couplings to make the arrow exact
    dense = np.asarray(schur_to_dense(SchurJtJ(U=U, W=W, V=V)))
    return SchurJtJ(U=U, W=W, V=V), jnp.asarray(dense)


def test_schur_quad_form_matches_dense():
    s, dense = _random_schur(0)
    ns = SchurNewtonSolver(nc=NC, n_points=NP, block_size=BS)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(NC + NP * BS,)))
    np.testing.assert_allclose(ns.quad_form(s, v), v @ dense @ v, rtol=1e-10)


def test_schur_gauss_newton_matches_dense():
    s, dense = _random_schur(2)
    ns = SchurNewtonSolver(nc=NC, n_points=NP, block_size=BS)
    dn = DenseNewtonSolver()
    b = jnp.asarray(np.random.default_rng(3).normal(size=(NC + NP * BS,)))
    kw = dict(lambda_initial=1e-10, lambda_max_tries=60)
    rs = ns.gauss_newton(s, b, jnp.asarray(0.0), **kw)
    rd = dn.gauss_newton(dense, b, jnp.asarray(0.0), **kw)
    assert bool(rs.ok)
    np.testing.assert_allclose(np.asarray(rs.step), np.asarray(rd.step),
                               rtol=1e-8)
    np.testing.assert_allclose(float(rs.lam), 0.0)


def test_schur_lambda_escalation_on_singular_blocks():
    s, dense = _random_schur(4)
    # make one point block singular
    V = s.V.at[3].set(jnp.zeros((BS, BS)))
    s = s._replace(V=V)
    ns = SchurNewtonSolver(nc=NC, n_points=NP, block_size=BS)
    b = jnp.asarray(np.random.default_rng(5).normal(size=(NC + NP * BS,)))
    r = ns.gauss_newton(s, b, jnp.asarray(0.0),
                        lambda_initial=1e-10, lambda_max_tries=60)
    assert bool(r.ok)
    assert float(r.lam) > 0.0
    # solution solves the damped dense system
    dense_damped = np.asarray(schur_to_dense(s)) + float(r.lam) * np.eye(
        NC + NP * BS)
    np.testing.assert_allclose(dense_damped @ (-np.asarray(r.step)),
                               np.asarray(b), rtol=1e-6, atol=1e-9)


def _ba_problem(dtype=jnp.float64):
    """Synthetic BA-style problem: shared global params c (NC,) and NP
    points q_i (BS,), each observed through known linear maps with noise:
    obs[i,k] = A[i,k] @ q_i + B[i,k] @ c. Linear => GN-exact, easy truth."""
    rng = np.random.default_rng(7)
    K = 6  # observations (rows of size 1) per point: K per point
    A = jnp.asarray(rng.normal(size=(NP, K, BS)), dtype)
    B = jnp.asarray(rng.normal(size=(NP, K, NC)), dtype)
    c_true = jnp.asarray(rng.normal(size=(NC,)), dtype)
    q_true = jnp.asarray(rng.normal(size=(NP, BS)), dtype)
    obs = (jnp.einsum('pkb,pb->pk', A, q_true)
           + jnp.einsum('pkc,c->pk', B, c_true)
           + jnp.asarray(rng.normal(size=(NP, K)) * 1e-3, dtype))

    def products(p):
        c = p[:NC]
        q = p[NC:].reshape(NP, BS)
        r = (jnp.einsum('pkb,pb->pk', A, q)
             + jnp.einsum('pkc,c->pk', B, c) - obs)      # (NP, K)
        norm2_x = jnp.sum(r * r)
        gc = jnp.einsum('pkc,pk->c', B, r)
        gq = jnp.einsum('pkb,pk->pb', A, r)
        Jt_x = jnp.concatenate([gc, gq.reshape(-1)])
        U = jnp.einsum('pkc,pkd->cd', B, B)
        W = jnp.einsum('pkc,pkb->cpb', B, A)
        V = jnp.einsum('pkb,pkd->pbd', A, A)
        return Products(norm2_x=norm2_x, Jt_x=Jt_x,
                        JtJ=SchurJtJ(U=U, W=W, V=V))

    p_true = jnp.concatenate([c_true, q_true.reshape(-1)])
    return products, p_true


def test_ba_style_solve_end_to_end():
    products, p_true = _ba_problem()
    ns = SchurNewtonSolver(nc=NC, n_points=NP, block_size=BS)
    p0 = jnp.zeros_like(p_true)
    r = solve_products(products, p0, DoglegParameters(), newton_solver=ns)
    # linear problem: one GN step to the optimum (within the trust region)
    assert int(r.step_count) <= 2
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(p_true),
                               atol=5e-3)


def test_ba_style_solve_jits_and_vmaps():
    products, p_true = _ba_problem()
    ns = SchurNewtonSolver(nc=NC, n_points=NP, block_size=BS)
    p0s = jnp.stack([jnp.zeros_like(p_true), jnp.ones_like(p_true)])
    solve = jax.jit(jax.vmap(
        lambda q: solve_products(products, q, newton_solver=ns).p))
    out = solve(p0s)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                               atol=1e-6)
