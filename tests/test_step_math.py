"""Unit tests for the step-computation primitives against closed forms and
numpy oracles — coverage the reference never had (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libdogleg_tpu.ops import cholesky as chol
from libdogleg_tpu.ops import dense as dops
from libdogleg_tpu.params import DoglegParameters


def _random_problem(seed, nmeas=40, nstate=7):
    rng = np.random.default_rng(seed)
    J = rng.normal(size=(nmeas, nstate))
    x = rng.normal(size=(nmeas,))
    return jnp.asarray(J), jnp.asarray(x)


def test_products_match_numpy():
    J, x = _random_problem(0)
    np.testing.assert_allclose(dops.build_jtj(J), np.asarray(J).T @ np.asarray(J),
                               rtol=1e-12)
    np.testing.assert_allclose(dops.jt_dot(J, x), np.asarray(J).T @ np.asarray(x),
                               rtol=1e-12)
    v = jnp.asarray(np.random.default_rng(1).normal(size=(J.shape[1],)))
    np.testing.assert_allclose(dops.quad_form(dops.build_jtj(J), v),
                               np.linalg.norm(np.asarray(J) @ np.asarray(v))**2,
                               rtol=1e-10)


def test_cauchy_step_minimizes_along_gradient():
    """The Cauchy point minimizes F(k) = norm2(x + k J Jt x) over k
    (reference derivation dogleg.c:536-550)."""
    J, x = _random_problem(2)
    JtJ = dops.build_jtj(J)
    Jt_x = dops.jt_dot(J, x)
    cs = dops.cauchy_step(Jt_x, JtJ)

    def F(k):
        return dops.norm2(x + J @ (k * Jt_x))
    k = cs.k
    eps = 1e-6
    assert F(k) < F(k + eps) and F(k) < F(k - eps)
    np.testing.assert_allclose(cs.norm2_step, dops.norm2(cs.step), rtol=1e-12)
    # Direction: along -Jt_x (descent)
    assert jnp.dot(cs.step, Jt_x) < 0


def test_interpolated_step_lands_on_trust_region_sphere():
    """The dog-leg point satisfies ||a + k(b-a)|| = trustregion exactly
    (reference dogleg.c:936-987)."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(5,)) * 0.5)   # cauchy, inside
    b = jnp.asarray(rng.normal(size=(5,)) * 10.0)  # gn, outside
    tr = jnp.asarray(2.0)
    assert dops.norm2(a) < tr * tr < dops.norm2(b)
    res = dops.interpolated_step(a, dops.norm2(a), b, tr)
    np.testing.assert_allclose(np.sqrt(res.norm2_step), 2.0, rtol=1e-12)
    assert 0.0 <= float(res.k) <= 1.0


def test_interpolated_step_negative_discriminant_clamped():
    """Rounding can push the discriminant slightly negative when the Cauchy
    point sits (numerically) on the sphere; must clamp to zero, not NaN
    (reference dogleg.c:975-979). Construction: d = a - b orthogonal to a
    (neg_c = 0) and norm2(a) infinitesimally above tr^2 makes the
    discriminant exactly -l2 * eps < 0."""
    a = jnp.asarray([3.0, 4.0])                      # ||a|| = 5
    b = a + jnp.asarray([4.0, -3.0])                 # (a - b) orthogonal to a
    tr = jnp.asarray(5.0 * (1.0 - 1e-14))            # tr^2 < norm2(a)
    res = dops.interpolated_step(a, jnp.asarray(25.0), b, tr)
    assert np.all(np.isfinite(np.asarray(res.step)))
    np.testing.assert_allclose(np.asarray(res.step), np.asarray(a),
                               rtol=1e-9)  # k clamps to 0 -> step == a


def test_expected_improvement_matches_direct():
    J, x = _random_problem(4)
    JtJ = dops.build_jtj(J)
    Jt_x = dops.jt_dot(J, x)
    step = jnp.asarray(np.random.default_rng(5).normal(size=(J.shape[1],)))
    direct = dops.norm2(x) - dops.norm2(x + J @ step)
    np.testing.assert_allclose(
        dops.expected_improvement(Jt_x, JtJ, step), direct, rtol=1e-9)


@pytest.mark.parametrize("rho,edge,expect", [
    # rho < 0.25, stepped to edge: just shrink x0.1 (dogleg.c:1343)
    (0.1, True, 10.0 * 0.1),
    # rho < 0.25, interior step: snap to ||GN|| first (dogleg.c:1332-1341)
    (0.1, False, 3.0 * 0.1),
    # 0.25 <= rho <= 0.75: unchanged
    (0.5, True, 10.0),
    (0.5, False, 10.0),
    # rho > 0.75 at edge: grow x2 (dogleg.c:1345-1350)
    (0.9, True, 20.0),
    # rho > 0.75 interior: unchanged (edge condition required)
    (0.9, False, 10.0),
])
def test_trust_region_update_rules(rho, edge, expect):
    prm = DoglegParameters()
    out = dops.trust_region_update(
        jnp.asarray(rho), jnp.asarray(10.0), jnp.asarray(edge),
        jnp.asarray(9.0),  # norm2_gn -> ||GN|| = 3
        decrease_factor=prm.trustregion_decrease_factor,
        decrease_threshold=prm.trustregion_decrease_threshold,
        increase_factor=prm.trustregion_increase_factor,
        increase_threshold=prm.trustregion_increase_threshold)
    np.testing.assert_allclose(out, expect, rtol=1e-12)


def test_trust_region_update_nan_rho_is_noop():
    """NaN rho must leave the region unchanged (C comparison semantics at
    reference dogleg.c:1324,1345: NaN fails both tests)."""
    prm = DoglegParameters()
    out = dops.trust_region_update(
        jnp.asarray(np.nan), jnp.asarray(10.0), jnp.asarray(True),
        jnp.asarray(9.0),
        decrease_factor=prm.trustregion_decrease_factor,
        decrease_threshold=prm.trustregion_decrease_threshold,
        increase_factor=prm.trustregion_increase_factor,
        increase_threshold=prm.trustregion_increase_threshold)
    np.testing.assert_allclose(out, 10.0)


def test_factorize_spd_no_lambda():
    J, _ = _random_problem(6)
    JtJ = dops.build_jtj(J)
    fac = chol.factorize_jtj(JtJ, jnp.asarray(0.0))
    assert bool(fac.ok)
    np.testing.assert_allclose(fac.lam, 0.0)
    np.testing.assert_allclose(fac.L @ fac.L.T, JtJ, rtol=1e-10, atol=1e-10)


def test_factorize_singular_escalates_lambda_permanently():
    """Singular JtJ: lambda starts at 1e-10 and multiplies by 10 until the
    factorization succeeds (reference dogleg.c:137-138, 670-676)."""
    n = 4
    JtJ = jnp.zeros((n, n), jnp.float64).at[0, 0].set(1.0)  # rank 1
    fac = chol.factorize_jtj(JtJ, jnp.asarray(0.0))
    assert bool(fac.ok)
    assert float(fac.lam) > 0.0
    # lambda must be a power of 10 times 1e-10
    ratio = np.log10(float(fac.lam) / 1e-10)
    np.testing.assert_allclose(ratio, round(ratio), atol=1e-9)
    # check the solve actually works against numpy on the damped system
    b = jnp.asarray(np.random.default_rng(7).normal(size=(n,)))
    z = chol.cholesky_solve(fac.L, b)
    np.testing.assert_allclose(
        (JtJ + fac.lam * jnp.eye(n)) @ z, b, rtol=1e-8, atol=1e-12)


def test_factorize_hopeless_reports_failure():
    JtJ = jnp.full((3, 3), jnp.nan, jnp.float64)
    fac = chol.factorize_jtj(JtJ, jnp.asarray(0.0), lambda_max_tries=5)
    assert not bool(fac.ok)


def test_gauss_newton_step_solves_normal_equations():
    J, x = _random_problem(8)
    JtJ = dops.build_jtj(J)
    Jt_x = dops.jt_dot(J, x)
    fac = chol.factorize_jtj(JtJ, jnp.asarray(0.0))
    step, n2 = chol.gauss_newton_step(fac.L, Jt_x)
    np.testing.assert_allclose(JtJ @ step, -Jt_x, rtol=1e-8)
    np.testing.assert_allclose(n2, dops.norm2(step), rtol=1e-12)
    # GN step from zero residual gradient direction sanity: matches lstsq
    lstsq = np.linalg.lstsq(np.asarray(J), -np.asarray(x), rcond=None)[0]
    np.testing.assert_allclose(step, lstsq, rtol=1e-8)


def test_kernels_are_jittable_and_vmappable():
    J, x = _random_problem(9)
    Jb = jnp.stack([J, 2 * J])
    xb = jnp.stack([x, x])

    @jax.jit
    @jax.vmap
    def cauchy_batch(J, x):
        JtJ = dops.build_jtj(J)
        return dops.cauchy_step(dops.jt_dot(J, x), JtJ).step

    out = cauchy_batch(Jb, xb)
    assert out.shape == (2, J.shape[1])
    assert np.all(np.isfinite(np.asarray(out)))


def test_small_cho_solve_mat_matches_numpy():
    """The multi-RHS unrolled substitutions (the Schur point-block
    backend, ops/smallchol.py) solve (L L^T) Z = B exactly."""
    import numpy as np

    from libdogleg_tpu.ops.smallchol import (small_bwd_solve_mat,
                                             small_cho_solve_mat,
                                             small_cholesky,
                                             small_fwd_solve_mat)

    rng = np.random.default_rng(7)
    for bs, batch, k in [(3, 50, 7), (6, 20, 1), (2, 1, 4)]:
        A = rng.normal(size=(batch, bs, bs))
        S = A @ np.swapaxes(A, -1, -2) + bs * np.eye(bs)
        B = rng.normal(size=(batch, bs, k))
        L, ok = small_cholesky(jnp.asarray(S))
        assert bool(jnp.all(ok))
        Z = small_cho_solve_mat(L, jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(Z), np.linalg.solve(S, B),
                                   rtol=1e-9, atol=1e-10)
        Y = small_fwd_solve_mat(L, jnp.asarray(B))
        np.testing.assert_allclose(
            np.asarray(Y), np.linalg.solve(np.asarray(L), B),
            rtol=1e-9, atol=1e-10)
        Z2 = small_bwd_solve_mat(L, jnp.asarray(B))
        np.testing.assert_allclose(
            np.asarray(Z2),
            np.linalg.solve(np.swapaxes(np.asarray(L), -1, -2), B),
            rtol=1e-9, atol=1e-10)
