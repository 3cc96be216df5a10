"""Model families (libdogleg_tpu.models): each converges through the public
API and is self-consistent (autodiff cross-checks on hand-written products)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libdogleg_tpu import DoglegParameters, StopReason, optimize
from libdogleg_tpu.models import bundle_adjustment, curve_fit
from libdogleg_tpu.models import quadratic_surface as qs
from libdogleg_tpu.solver import solve_products


def test_sample_problem_alias():
    """The legacy module path keeps working."""
    import libdogleg_tpu.sample_problem as sp
    assert sp.model is qs.model and sp.NSTATE == qs.NSTATE


@pytest.mark.parametrize("make", [curve_fit.make_dense_problem,
                                  curve_fit.make_products_problem,
                                  curve_fit.make_residual_problem])
def test_curve_fit_converges(make):
    meas = curve_fit.simulate(jax.random.PRNGKey(0))
    p0 = curve_fit.initial_state(jax.random.PRNGKey(1))
    r = jax.jit(lambda q: optimize(make(meas), q, DoglegParameters()))(p0)
    assert StopReason(int(r.reason)) in (StopReason.GRADIENT_CONVERGED,
                                         StopReason.SMALL_STEP)
    np.testing.assert_allclose(np.asarray(r.p), curve_fit.P_TRUE, atol=5e-2)


def test_curve_fit_is_nonlinear():
    """The curve fit must take >1 accepted step from a cold start (unlike the
    quadratic-surface demo, which is linear in p)."""
    meas = curve_fit.simulate(jax.random.PRNGKey(0))
    p0 = curve_fit.initial_state(jax.random.PRNGKey(1))
    r = optimize(curve_fit.make_dense_problem(meas), p0, DoglegParameters())
    assert int(r.step_count) > 1


def test_curve_fit_jacobian_matches_autodiff():
    t = curve_fit.make_t(16)
    p = jnp.asarray([1.3, -0.7, 0.2])
    J = curve_fit.jacobian(p, t)
    J_ad = jax.jacfwd(lambda q: curve_fit.model(q, t))(p)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad),
                               rtol=1e-12, atol=1e-12)


def test_ba_products_match_autodiff():
    """The hand-reduced arrow products agree with autodiff on the residuals:
    grad(norm2_x) == 2 Jt_x, and the quadratic form through SchurJtJ equals
    norm2(J v)."""
    ba = bundle_adjustment.make_synthetic(seed=1, nc=5, n_points=7,
                                          block_size=2, k_obs=3,
                                          dtype=jnp.float64)
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.normal(size=(ba.nstate,)))
    prod = ba.products(p)
    g = jax.grad(lambda q: jnp.sum(ba.residuals(q) ** 2))(p)
    np.testing.assert_allclose(np.asarray(prod.Jt_x), np.asarray(g) / 2.0,
                               rtol=1e-10, atol=1e-12)
    v = jnp.asarray(rng.normal(size=(ba.nstate,)))
    Jv = jax.jvp(lambda q: ba.residuals(q), (p,), (v,))[1]
    qf = ba.newton_solver().quad_form(prod.JtJ, v)
    np.testing.assert_allclose(float(qf), float(jnp.sum(Jv * Jv)),
                               rtol=1e-10)


def test_ba_solve_recovers_truth():
    """noise=0 makes p_true the exact optimum; one solve recovers it."""
    ba = bundle_adjustment.make_synthetic(seed=3, nc=8, n_points=50,
                                          block_size=3, k_obs=4,
                                          dtype=jnp.float64)
    r = jax.jit(lambda p0: solve_products(
        ba.products, p0, DoglegParameters(),
        newton_solver=ba.newton_solver()))(jnp.zeros(ba.nstate))
    assert float(r.norm2_x) < 1e-16
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(ba.p_true),
                               atol=1e-7)


def test_grid_mrf_sparse_solve():
    """The grid MRF solves through the block-sparse JtJ + level-scheduled
    Cholesky; being linear, one GN step reaches the optimum, and the
    fill-reducing ordering beats natural order on the grid pattern."""
    from libdogleg_tpu.models import grid_mrf
    from libdogleg_tpu.ops.bcsr import jtj_lower_schedule
    from libdogleg_tpu import sparse_cholesky as sc

    m = grid_mrf.make_grid_mrf(width=8, height=6, block_size=3)
    prob = m.problem(jtj="sparse")
    r = jax.jit(lambda q: optimize(prob, q, DoglegParameters(),
                                   newton_solver=prob.default_newton_solver()
                                   ))(jnp.zeros(m.nstate))
    assert int(r.step_count) <= 2
    assert float(jnp.max(jnp.abs(r.Jt_x))) < 1e-9
    # linear problem oracle: normal equations on the densified system
    x0, _ = prob.f(jnp.zeros(m.nstate))
    _, Jd = prob.full(jnp.zeros(m.nstate))
    Jd = np.asarray(Jd)
    p_opt = np.linalg.solve(Jd.T @ Jd, -Jd.T @ np.asarray(x0))
    np.testing.assert_allclose(np.asarray(r.p), p_opt, rtol=1e-8, atol=1e-9)

    # ordering value: strictly less fill than natural on the grid
    sched = jtj_lower_schedule(m.structure)
    nat = sc.analyze(sched.rows, sched.cols, m.n_nodes, m.block_size,
                     ordering="natural")
    amd = sc.analyze(sched.rows, sched.cols, m.n_nodes, m.block_size,
                     ordering="mindeg")
    assert amd.nslots < nat.nslots


def test_pinhole_ba_gradients_and_convergence():
    """The nonlinear pinhole BA's hand-assembled arrow products agree with
    autodiff, and the solve recovers the true cameras/points from a
    jittered start through TreeSchurNewtonSolver."""
    from libdogleg_tpu.models import pinhole_ba

    ba = pinhole_ba.make_synthetic(seed=0, ncam=4, npts=60)
    p = ba.p0(jax.random.PRNGKey(0), jitter=0.05)
    prod = ba.products(p)

    def n2(pp):
        r = ba.residuals_obs(pp)
        r0 = jnp.sqrt(ba.w_prior_cam0) * (pp["c"][:6] - ba.cam0_prior)
        rp = jnp.sqrt(ba.w_prior_pts) * (pp["q"] - ba.pts_prior)
        return jnp.sum(r * r) + jnp.dot(r0, r0) + jnp.sum(rp * rp)

    g = jax.grad(n2)(p)
    for k in ("c", "q"):
        np.testing.assert_allclose(np.asarray(prod.Jt_x[k]),
                                   np.asarray(g[k]) / 2.0,
                                   rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(prod.norm2_x), float(n2(p)),
                               rtol=1e-12)
    # quad_form identity: v^T JtJ v == norm2(J v) via jvp of all residuals
    rng = np.random.default_rng(1)
    v = {"c": jnp.asarray(rng.normal(size=ba.ncam * 6)),
         "q": jnp.asarray(rng.normal(size=(ba.npts, 3)))}
    def all_res(pp):
        return jnp.concatenate([
            ba.residuals_obs(pp),
            jnp.sqrt(ba.w_prior_cam0) * (pp["c"][:6] - ba.cam0_prior),
            (jnp.sqrt(ba.w_prior_pts) * (pp["q"] - ba.pts_prior)).ravel()])
    Jv = jax.jvp(all_res, (p,), (v,))[1]
    qf = ba.newton_solver().quad_form(prod.JtJ, v)
    np.testing.assert_allclose(float(qf), float(jnp.sum(Jv * Jv)),
                               rtol=1e-9)

    r = jax.jit(lambda q: solve_products(
        ba.products, q, DoglegParameters(),
        newton_solver=ba.newton_solver()))(p)
    assert StopReason(int(r.reason)) in (StopReason.GRADIENT_CONVERGED,
                                         StopReason.SMALL_STEP)
    assert float(jnp.max(jnp.abs(r.p["c"] - ba.p_true["c"]))) < 2e-2
    # residual level consistent with the injected pixel noise
    nobs_res = 2 * ba.nobs
    assert float(r.norm2_x) < 0.5 ** 2 * nobs_res


def test_pinhole_ba_grid_products_match_scatter_path():
    """The scatter-free full-visibility products (_products_grid) equal
    the generic per-observation scatter assembly: permuting the
    observation order defeats the grid detection, forcing the generic
    path on identical data."""
    import numpy as np

    from libdogleg_tpu.models import pinhole_ba

    ba = pinhole_ba.make_synthetic(seed=3, ncam=4, npts=40)
    assert ba._dense_grid
    rng = np.random.default_rng(1)
    perm = rng.permutation(ba.nobs)
    ba_perm = ba._replace(cam_idx=ba.cam_idx[perm],
                          pt_idx=ba.pt_idx[perm], obs=ba.obs[perm])
    assert not ba_perm._dense_grid

    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    a = jax.jit(lambda pc, pq: ba.products({"c": pc, "q": pq}))(
        p0["c"], p0["q"])
    b = jax.jit(lambda pc, pq: ba_perm.products({"c": pc, "q": pq}))(
        p0["c"], p0["q"])
    np.testing.assert_allclose(float(a.norm2_x), float(b.norm2_x),
                               rtol=1e-12)
    for x, y in [(a.Jt_x["c"], b.Jt_x["c"]), (a.Jt_x["q"], b.Jt_x["q"]),
                 (a.JtJ.U, b.JtJ.U), (a.JtJ.W, b.JtJ.W),
                 (a.JtJ.V, b.JtJ.V)]:
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-9, atol=1e-12)


def test_pinhole_ba_traced_indices():
    """products stays traceable when the index fields are tracers (an
    instance passed through jit as data): _dense_grid cannot inspect a
    tracer, so it must fall back to the generic scatter path instead of
    raising TracerArrayConversionError — and the numbers must match the
    eager grid path on the same data."""
    import numpy as np

    from libdogleg_tpu.models import pinhole_ba

    ba = pinhole_ba.make_synthetic(seed=3, ncam=3, npts=20)
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    eager = ba.products(p0)   # grid path (concrete indices)

    def f(ci, pi, pc, pq):
        bt = ba._replace(cam_idx=ci, pt_idx=pi)
        pr = bt.products({"c": pc, "q": pq})
        return pr.norm2_x, pr.Jt_x, pr.JtJ

    n2, jtx, jtj = jax.jit(f)(ba.cam_idx, ba.pt_idx, p0["c"], p0["q"])
    np.testing.assert_allclose(float(n2), float(eager.norm2_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jtj.V), np.asarray(eager.JtJ.V),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jtx["c"]),
                               np.asarray(eager.Jt_x["c"]),
                               rtol=1e-5, atol=1e-5)


def test_sparse_visibility_ba_matches_dense_w():
    """SparseWSchurNewtonSolver on the sparse-visibility BA model takes
    the same trajectory as TreeSchurNewtonSolver on the densified-W
    oracle, and converges to the pixel-noise floor."""
    import numpy as np

    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.models import pinhole_ba
    from libdogleg_tpu.ops.newton import TreeSchurNewtonSolver
    from libdogleg_tpu.solver import solve_products

    ba = pinhole_ba.make_synthetic_sparse(seed=0, ncam=8, npts=120,
                                          k_obs=3)
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    ns_s = ba.newton_solver()
    ns_d = TreeSchurNewtonSolver(nc=ba.ncam * 6, n_points=ba.npts,
                                 block_size=3)

    pr_s = jax.jit(lambda pc, pq: ba.products({"c": pc, "q": pq}))(
        p0["c"], p0["q"])
    pr_d = jax.jit(lambda pc, pq: ba.dense_w_products({"c": pc, "q": pq}))(
        p0["c"], p0["q"])
    v = {"c": jnp.asarray(np.random.default_rng(0).normal(size=ba.ncam*6)),
         "q": jnp.asarray(np.random.default_rng(1).normal(
             size=(ba.npts, 3)))}
    np.testing.assert_allclose(float(ns_s.quad_form(pr_s.JtJ, v)),
                               float(ns_d.quad_form(pr_d.JtJ, v)),
                               rtol=1e-10)
    g_s = ns_s.gauss_newton(pr_s.JtJ, pr_s.Jt_x, jnp.asarray(0.0),
                            lambda_initial=1e-10, lambda_max_tries=60)
    g_d = ns_d.gauss_newton(pr_d.JtJ, pr_d.Jt_x, jnp.asarray(0.0),
                            lambda_initial=1e-10, lambda_max_tries=60)
    np.testing.assert_allclose(np.asarray(g_s.step["c"]),
                               np.asarray(g_d.step["c"]),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_s.step["q"]),
                               np.asarray(g_d.step["q"]),
                               rtol=1e-6, atol=1e-9)

    r_s = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ns_s))(p0["c"], p0["q"])
    r_d = jax.jit(lambda pc, pq: solve_products(
        ba.dense_w_products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ns_d))(p0["c"], p0["q"])
    # summation orders differ between the sparse and densified-W
    # assemblies, so the last at-threshold termination step can flip;
    # require matching converged states, not identical attempt counts
    assert abs(int(r_s.step_count) - int(r_d.step_count)) <= 1
    np.testing.assert_allclose(float(r_s.norm2_x), float(r_d.norm2_x),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(r_s.p["q"]),
                               np.asarray(r_d.p["q"]), rtol=1e-5,
                               atol=1e-7)
    # pixel-noise floor: 0.5^2 * 2 * nobs = 180
    assert float(r_s.norm2_x) < 500


def test_sparse_visibility_ba_chunked_s_assembly():
    """The memory-bounded chunked reduced-system accumulation (forced via
    a tiny s_chunk_limit) matches the single-pass form exactly."""
    import dataclasses

    import numpy as np

    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.models import pinhole_ba
    from libdogleg_tpu.solver import solve_products

    ba = pinhole_ba.make_synthetic_sparse(seed=0, ncam=8, npts=120,
                                          k_obs=3)
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    ns = ba.newton_solver()
    ns_chunk = dataclasses.replace(ns, s_chunk_limit=512)
    r1 = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ns))(p0["c"], p0["q"])
    r2 = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ns_chunk))(p0["c"], p0["q"])
    # summation orders differ between the two assemblies, so the last
    # at-threshold step can flip; require convergence + matching states,
    # not identical attempt counts
    assert abs(int(r1.step_count) - int(r2.step_count)) <= 1
    np.testing.assert_allclose(float(r1.norm2_x), float(r2.norm2_x),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(r1.p["q"]),
                               np.asarray(r2.p["q"]), rtol=1e-6,
                               atol=1e-8)


def test_sparse_visibility_ba_obs_mask_padding():
    """Variable per-point visibility via obs_mask: an instance padded to
    k_obs+1 slots with the extra slot masked produces the same products,
    the same quad_form, and the same Gauss-Newton step as the unpadded
    instance — masked slots contribute exactly nothing (the padded
    nonlinear solve still converges; trajectories are not compared
    step-for-step because ~1e-10 rounding differences compound)."""
    import numpy as np

    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.models import pinhole_ba
    from libdogleg_tpu.solver import solve_products

    ba = pinhole_ba.make_synthetic_sparse(seed=7, ncam=6, npts=50, k_obs=2)
    pad_cam = jnp.concatenate(
        [ba.cam_of, jnp.zeros((ba.npts, 1), ba.cam_of.dtype)], axis=1)
    pad_obs = jnp.concatenate(
        [ba.obs, jnp.zeros((ba.npts, 1, 2), ba.obs.dtype)], axis=1)
    mask = jnp.concatenate([jnp.ones((ba.npts, 2)),
                            jnp.zeros((ba.npts, 1))], axis=1)
    ba_pad = ba._replace(k_obs=3, cam_of=pad_cam, obs=pad_obs,
                         obs_mask=mask)

    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    pr_a = ba.products(p0)
    pr_b = ba_pad.products(p0)
    np.testing.assert_allclose(float(pr_a.norm2_x), float(pr_b.norm2_x),
                               rtol=1e-12)
    for key in ("c", "q"):
        np.testing.assert_allclose(np.asarray(pr_a.Jt_x[key]),
                                   np.asarray(pr_b.Jt_x[key]),
                                   rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(pr_a.JtJ.U),
                               np.asarray(pr_b.JtJ.U),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pr_a.JtJ.V),
                               np.asarray(pr_b.JtJ.V),
                               rtol=1e-12, atol=1e-12)
    assert float(jnp.abs(pr_b.JtJ.Wv[:, 2]).max()) == 0.0

    ns_a, ns_b = ba.newton_solver(), ba_pad.newton_solver()
    rng = np.random.default_rng(0)
    v = {"c": jnp.asarray(rng.normal(size=ba.ncam * 6)),
         "q": jnp.asarray(rng.normal(size=(ba.npts, 3)))}
    np.testing.assert_allclose(float(ns_a.quad_form(pr_a.JtJ, v)),
                               float(ns_b.quad_form(pr_b.JtJ, v)),
                               rtol=1e-10)
    g_a = ns_a.gauss_newton(pr_a.JtJ, pr_a.Jt_x, jnp.asarray(0.0),
                            lambda_initial=1e-10, lambda_max_tries=60)
    g_b = ns_b.gauss_newton(pr_b.JtJ, pr_b.Jt_x, jnp.asarray(0.0),
                            lambda_initial=1e-10, lambda_max_tries=60)
    np.testing.assert_allclose(np.asarray(g_a.step["c"]),
                               np.asarray(g_b.step["c"]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_a.step["q"]),
                               np.asarray(g_b.step["q"]),
                               rtol=1e-5, atol=1e-8)

    r_b = jax.jit(lambda pc, pq: solve_products(
        ba_pad.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ns_b))(p0["c"], p0["q"])
    # padded instance converges to the pixel-noise floor (true nobs!)
    assert float(r_b.norm2_x) < 0.5 * 2 * (ba.npts * 2)


def test_sparse_visibility_ba_singular_V_lambda_escalation():
    """Rank-deficient BA at scale through the full sparse-W Schur solve
    (VERDICT r3 ask 7): a block of points has NO observations and NO
    prior, so their V blocks are exactly singular and every factorization
    attempt at lambda=0 fails until the permanent escalating lambda
    (reference dogleg.c:670-676, 811-815) kicks in. The solve must (a)
    escalate lambda and converge anyway, leaving the unobserved points
    untouched, and (b) report FACTORIZATION_FAILED when the escalation
    budget is zeroed out."""
    from libdogleg_tpu.models import pinhole_ba
    ba = pinhole_ba.make_synthetic_sparse(seed=3, ncam=8, npts=400,
                                          k_obs=4, pixel_noise=0.1)
    n_dead = 64
    mask = jnp.ones((ba.npts, ba.k_obs))
    mask = mask.at[-n_dead:].set(0.0)  # last 64 points: zero observations
    ba = ba._replace(obs_mask=mask, w_prior_pts=0.0,
                     # keep the problem otherwise well-posed: pin scale
                     # via a mild prior on the OBSERVED points only is not
                     # expressible through the scalar w_prior_pts, so keep
                     # the strong cam0 prior and accept the soft scale
                     # gauge; the test asserts cost + lambda + reasons,
                     # not tight parameter recovery
                     )
    ns = ba.newton_solver()
    p0 = ba.p0(jax.random.PRNGKey(5), jitter=0.01)

    r = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ns))(p0["c"], p0["q"])
    assert int(r.reason) in (int(StopReason.GRADIENT_CONVERGED),
                             int(StopReason.SMALL_STEP),
                             int(StopReason.MAX_ITERATIONS))
    assert int(r.reason) != int(StopReason.FACTORIZATION_FAILED)
    # lambda escalated off zero (V blocks of the dead points are singular)
    assert float(r.lam) > 0.0
    # converged to the pixel-noise floor of the LIVE observations
    live_obs = 2 * (ba.npts - n_dead) * ba.k_obs
    assert float(r.norm2_x) < 0.5 * live_obs * (0.1 ** 2) * 4
    # unobserved, prior-free points have zero gradient: never moved
    np.testing.assert_allclose(np.asarray(r.p["q"][-n_dead:]),
                               np.asarray(p0["q"][-n_dead:]),
                               rtol=0, atol=0)

    # (b) zero escalation budget -> the failure is terminal and reported
    prm0 = DoglegParameters(lambda_max_tries=0)
    r_fail = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, prm0,
        newton_solver=ns))(p0["c"], p0["q"])
    assert int(r_fail.reason) == int(StopReason.FACTORIZATION_FAILED)
