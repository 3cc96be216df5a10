"""Basis-factored sufficient-statistics formulation of the sample problem
(models/quadratic_surface: factored_products / make_factored_problem).

The model is linear in a static basis, so JtJ/Jt_x/norm2 reduce to
precomputed Gram statistics — per-attempt cost independent of the
measurement count. The cancelling combinations (G c - h, meas.meas - c.h)
run in double-f32 compensated arithmetic; these tests pin (1) exact
equivalence to the general products in f64, (2) that in f32 the factored
gradient is orders of magnitude MORE accurate than the general
per-measurement reduction (against the f64 oracle evaluated at the same
f32-rounded coefficients both forms actually use), and (3) end-to-end
solve equivalence, single and batched."""

import jax
import jax.numpy as jnp
import numpy as np

import libdogleg_tpu as dl
import libdogleg_tpu.models.quadratic_surface as sp


def _instance(dtype=jnp.float64):
    meas = sp.simulate(jax.random.PRNGKey(0), dtype=dtype)
    p0 = sp.initial_state(jax.random.PRNGKey(1), dtype=dtype)
    return meas, p0


def test_factored_products_match_general_f64():
    meas, p0 = _instance()
    pg = sp.make_products_problem(meas).products(p0)
    pf = sp.make_factored_problem(meas).products(p0)
    np.testing.assert_allclose(float(pf.norm2_x), float(pg.norm2_x),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(pf.Jt_x), np.asarray(pg.Jt_x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pf.JtJ), np.asarray(pg.JtJ),
                               rtol=1e-12)


def test_factored_f32_gradient_beats_general():
    """Near the optimum, the factored-compensated f32 gradient matches the
    f64 oracle (at the f32-rounded coefficients) to ~1e-8 absolute; the
    general form's per-measurement f32 reduction is ~1e-1 off — the
    compensated statistics don't just break even, they improve on the
    reference formulation's own accuracy."""
    meas, p0 = _instance()
    r = jax.jit(lambda q: dl.optimize(
        sp.make_dense_problem(meas), q,
        dl.DoglegParameters(max_iterations=8)))(p0)
    p32 = np.asarray(r.p, np.float32)
    meas32 = np.asarray(meas, np.float32)
    # f64 oracle AT the f32-rounded coefficients (both f32 forms round
    # coeffs identically; an f64-coefficients oracle would charge that
    # shared, inherent rounding to whichever form is being measured)
    gx, gy = (np.asarray(a, np.float64) for a in make_grid_np())
    B = np.stack([gx * gx, gy * gy, gx * gy, gx, gy,
                  np.ones_like(gx)], -1)
    c32 = np.float32([p32[0] * p32[1], p32[1] * p32[2], p32[2],
                      p32[3], p32[4], p32[5]]).astype(np.float64)
    T = np.asarray(sp.coeffs_jac(jnp.asarray(p32, jnp.float64)))
    jtx_true = T.T @ (B.T @ (B @ c32 - meas32.astype(np.float64)))

    pf = sp.make_factored_problem(jnp.asarray(meas32)).products(
        jnp.asarray(p32))
    pg = sp.make_products_problem(jnp.asarray(meas32)).products(
        jnp.asarray(p32))
    err_f = np.max(np.abs(np.asarray(pf.Jt_x, np.float64) - jtx_true))
    err_g = np.max(np.abs(np.asarray(pg.Jt_x, np.float64) - jtx_true))
    assert err_f < 1e-6, err_f
    assert err_f < err_g * 1e-3, (err_f, err_g)


def make_grid_np():
    coords = sp.GRID_MIN + sp.GRID_DELTA * np.arange(sp.GRID_WIDTH)
    gx, gy = np.meshgrid(coords, coords, indexing="ij")
    return gx.ravel(), gy.ravel()


def test_factored_solve_end_to_end():
    meas, p0 = _instance()
    r = jax.jit(lambda q: dl.optimize(
        sp.make_factored_problem(meas), q,
        dl.DoglegParameters(max_iterations=8)))(p0)
    assert np.max(np.abs(np.asarray(r.p) - sp.P_TRUE)) < 5e-2
    # identical trajectory to the general form in f64 (same products to
    # ~1 ulp; both terminate at the same step with the same reason)
    r_g = jax.jit(lambda q: dl.optimize(
        sp.make_products_problem(meas), q,
        dl.DoglegParameters(max_iterations=8)))(p0)
    assert int(r.step_count) == int(r_g.step_count)
    assert int(r.reason) == int(r_g.reason)
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(r_g.p),
                               rtol=1e-9)


def test_generic_adapter_autodiff_jac():
    """FactoredBasisProblem with the DEFAULT autodiff coefficient
    Jacobian (no closed form supplied) matches the closed-form path
    exactly — the adapter is usable on any separable model with just
    `coeffs` + the basis."""
    from libdogleg_tpu.problems import FactoredBasisProblem
    meas, p0 = _instance()
    gx, gy = make_grid_np()
    B = np.stack([gx * gx, gy * gy, gx * gy, gx, gy,
                  np.ones_like(gx)], -1)
    prob = FactoredBasisProblem(
        coeffs=sp.coeffs,
        G_pair=FactoredBasisProblem.gram(B, meas.dtype),
        stats=FactoredBasisProblem.statistics(jnp.asarray(B, meas.dtype),
                                              meas))
    pr_auto = prob.products(p0)
    pr_closed = sp.make_factored_problem(meas).products(p0)
    np.testing.assert_allclose(np.asarray(pr_auto.Jt_x),
                               np.asarray(pr_closed.Jt_x), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(pr_auto.JtJ),
                               np.asarray(pr_closed.JtJ), rtol=1e-13)
    r = jax.jit(lambda q: dl.optimize(
        prob, q, dl.DoglegParameters(max_iterations=8)))(p0)
    assert np.max(np.abs(np.asarray(r.p) - sp.P_TRUE)) < 5e-2


def test_factored_batched_f32():
    """The batched fleet shape (the headline config 3 protocol) on the
    factored formulation, f32: recovery matches the general form's."""
    from libdogleg_tpu.parallel.batched import batched_optimize
    batch = 256
    dtype = jnp.float32
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), batch))
    prm = dl.DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                              update_threshold=1e-5,
                              trustregion_threshold=1e-5)
    G_pair = sp.gram_pair(dtype)
    stats = jax.vmap(sp.factored_statistics)(meas)
    r = jax.jit(lambda q, s: batched_optimize(
        lambda p, st: sp.factored_products(p, st, G_pair), q, prm,
        problem_data=s))(p0s, stats)
    err = np.abs(np.asarray(r.p) - sp.P_TRUE[None])
    assert float(np.mean(np.all(err < 0.2, -1))) >= 0.99
