"""Tests for the diagnostics, gradient-check, and outlierness suites against
numpy oracles (the oracle formulas are the ones in the reference's own
disabled self-check scripts, dogleg.c:2748-2783)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import libdogleg_tpu.sample_problem as sp
from libdogleg_tpu import DoglegParameters, optimize
from libdogleg_tpu.analysis import (check_gradients, check_gradients_autodiff,
                                    format_gradient_table,
                                    get_outlierness_factors,
                                    get_outlierness_scale, mark_outliers,
                                    outlierness_trace_new_feature,
                                    report_outliers)
from libdogleg_tpu.analysis.gradients import check_gradients_products
from libdogleg_tpu.diagnostics import (explain_result, format_vnlog,
                                       print_vnlog, vnlog_legend)
from libdogleg_tpu.ops.cholesky import factorize_jtj


@pytest.fixture(scope="module")
def measurements():
    return sp.simulate(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def p0():
    return sp.initial_state(jax.random.PRNGKey(1))


# ---------------------------------------------------------------- vnlog

def test_vnlog_schema_and_rows(measurements, p0):
    problem = sp.make_dense_problem(measurements)
    r = optimize(problem, p0, DoglegParameters(), record_history=True)
    text = format_vnlog(r.history, r.n_attempts)
    lines = text.strip().split("\n")
    # legend matches the reference field list (dogleg.c:50-64, 80)
    assert lines[0] == vnlog_legend()
    assert "norm2x_before" in lines[0] and "trustregion_after" in lines[0]
    assert len(lines) - 1 == int(r.n_attempts)
    # every row has iteration, accepted flag and 14 fields
    for row in lines[1:]:
        cells = row.split()
        assert len(cells) == 16
        assert cells[1] in ("0", "1")
        assert cells[9] in ("cauchy", "gaussnewton", "interpolated", "-")
    # accepted steps count matches
    accepted = sum(int(row.split()[1]) for row in lines[1:])
    assert accepted == int(r.step_count)
    assert "accepted steps" in explain_result(r)


def test_vnlog_rho_consistency(measurements, p0):
    """Recorded rho must equal observed/expected from the same row."""
    problem = sp.make_dense_problem(measurements)
    r = optimize(problem, p0, DoglegParameters(), record_history=True)
    h = r.history
    n = int(r.n_attempts)
    rho = np.asarray(h.rho[:n])
    obs = np.asarray(h.observed_improvement[:n])
    exp = np.asarray(h.expected_improvement[:n])
    m = np.isfinite(rho)
    np.testing.assert_allclose(rho[m], obs[m] / exp[m], rtol=1e-12)


def test_print_vnlog_requires_history(measurements, p0):
    r = optimize(sp.make_dense_problem(measurements), p0)
    with pytest.raises(ValueError):
        print_vnlog(r)


# ---------------------------------------------------------------- gradients

@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_gradient_check_correct_jacobian(measurements, p0, mode):
    make = (sp.make_dense_problem if mode == "dense"
            else sp.make_sparse_problem)
    problem = make(measurements)
    for ivar in range(sp.NSTATE):
        chk = check_gradients(problem, p0, ivar)
        # the hand-written Jacobian is exact; only finite-difference error
        assert float(jnp.max(chk.error_relative)) < 1e-5
    table = format_gradient_table(chk)
    assert table.startswith("# ivar imeasurement gradient_reported")
    assert len(table.strip().split("\n")) == sp.NMEAS + 1


def test_gradient_check_detects_broken_jacobian(measurements, p0):
    base = sp.make_dense_problem(measurements)

    from libdogleg_tpu.problems import DenseProblem

    def broken(p):
        x, J = base.f(p)
        return x, J.at[:, 2].mul(1.5)  # corrupt one column

    chk_ok = check_gradients(DenseProblem(f=broken), p0, 0)
    chk_bad = check_gradients(DenseProblem(f=broken), p0, 2)
    assert float(jnp.max(chk_ok.error_relative)) < 1e-5
    assert float(jnp.max(chk_bad.error_relative)) > 0.1


def test_gradient_check_autodiff(measurements, p0):
    problem = sp.make_dense_problem(measurements)
    rel = check_gradients_autodiff(problem, p0)
    assert float(jnp.max(rel)) < 1e-12  # exact Jacobian, exact autodiff


def test_gradient_check_products_mode(measurements, p0):
    """The reference never implemented this (dogleg.c:440-446)."""
    problem = sp.make_products_problem(measurements)
    for ivar in range(sp.NSTATE):
        _, _, _, rel = check_gradients_products(problem, p0, ivar)
        assert float(rel) < 1e-5


# ---------------------------------------------------------------- outlierness

def _solved_point(measurements, p0):
    problem = sp.make_dense_problem(measurements)
    r = optimize(problem, p0)
    x, J = problem.full(r.p)
    fac = factorize_jtj(r.JtJ, r.lam)
    return r, np.asarray(x), np.asarray(J), fac


def _oracle_factors(x, J, feature_size):
    """The reference's own numpy self-check (dogleg.c:2748-2783), with the
    k/8 hack of dogleg.c:2374-2378 applied as the code does."""
    nmeas, nstate = J.shape
    nf = nmeas // feature_size
    scale = nmeas / (4.0 * ((nstate + 1) * (x @ x) / (nmeas - nstate - 1)))
    inv_jtj = np.linalg.inv(J.T @ J)
    factors = np.zeros(nf)
    for f in range(nf):
        sl = slice(f * feature_size, (f + 1) * feature_size)
        Jf = J[sl]
        xf = x[sl]
        A = Jf @ inv_jtj @ Jf.T
        if feature_size == 1:
            factors[f] = float(xf[0] ** 2 / (1.0 - A[0, 0]))
        else:
            B = np.linalg.inv(A - np.eye(feature_size))
            factors[f] = float(xf @ (B + B @ B) @ xf)
    return factors * scale / 8.0, scale


@pytest.mark.parametrize("feature_size", [1, 2, 4])
def test_outlierness_factors_match_oracle(measurements, p0, feature_size):
    _, x, J, fac = _solved_point(measurements, p0)
    factors, scale = get_outlierness_factors(
        x, jnp.asarray(J), fac.L, feature_size=feature_size)
    oracle, oracle_scale = _oracle_factors(x, J, feature_size)
    np.testing.assert_allclose(scale, oracle_scale, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(factors), oracle, rtol=1e-8)


def test_outlierness_flags_planted_outlier(measurements, p0):
    """Corrupt one measurement hard; it must get the largest factor."""
    bad = measurements.at[37].add(50.0)
    problem = sp.make_dense_problem(bad)
    r = optimize(problem, p0)
    x, J = problem.full(r.p)
    fac = factorize_jtj(r.JtJ, r.lam)
    factors, _ = get_outlierness_factors(x, jnp.asarray(np.asarray(J)),
                                         fac.L, feature_size=1)
    f = np.asarray(factors)
    assert int(np.argmax(f)) == 37
    assert f[37] > 1.0


def test_scale_reuse_convention(measurements, p0):
    _, x, J, fac = _solved_point(measurements, p0)
    factors1, scale = get_outlierness_factors(x, jnp.asarray(J), fac.L)
    factors2, scale2 = get_outlierness_factors(x, jnp.asarray(J), fac.L,
                                               scale=scale)
    np.testing.assert_allclose(scale2, scale)
    np.testing.assert_allclose(np.asarray(factors2), np.asarray(factors1))


def test_mark_outliers_confidence_gate(measurements, p0):
    bad = measurements.at[37].add(50.0)
    problem = sp.make_dense_problem(bad)
    r = optimize(problem, p0)
    x, J = problem.full(r.p)
    fac = factorize_jtj(r.JtJ, r.lam)
    factors, _ = get_outlierness_factors(x, jnp.asarray(np.asarray(J)),
                                         fac.L, feature_size=1)

    # Confidence callback: removing any single measurement barely moves
    # confidence -> candidates accepted.
    res = mark_outliers(factors, lambda i: 100.0 if i < 0 else 99.9)
    assert res.marked[37]
    assert res.marked_any and res.n_outliers >= 1

    # Confidence collapses when anything is removed -> nothing marked.
    res2 = mark_outliers(factors, lambda i: 100.0 if i < 0 else 10.0)
    assert not res2.marked_any

    # Already-marked features are kept and counted (reference
    # dogleg.c:3065-3069).
    pre = np.zeros(len(np.asarray(factors)), bool)
    pre[5] = True
    res3 = mark_outliers(factors, lambda i: 100.0 if i < 0 else 99.9,
                         marked=pre)
    assert res3.marked[5] and res3.n_outliers >= 2


def test_report_outliers_format(measurements, p0):
    _, x, J, fac = _solved_point(measurements, p0)
    factors, _ = get_outlierness_factors(x, jnp.asarray(J), fac.L)
    text = report_outliers(factors[:5], lambda i: 100.0 if i < 0 else 99.0)
    assert text.startswith("## Outlier statistics")
    assert len(text.strip().split("\n")) == 2 + 5


def test_query_trace_matches_oracle(measurements, p0):
    """trace form vs direct numpy: A = Jq inv(JtJ) Jq^T, B = inv(A+I),
    result = scale (2 - tr B) for feature_size 2 (dogleg.c:2824-3006)."""
    r, x, J, fac = _solved_point(measurements, p0)
    rng = np.random.default_rng(0)
    Jq = rng.normal(size=(2, sp.NSTATE))
    got = outlierness_trace_new_feature(jnp.asarray(Jq), fac.L,
                                        r.norm2_x, sp.NMEAS)
    inv_jtj = np.linalg.inv(J.T @ J + float(r.lam) * np.eye(sp.NSTATE))
    A = Jq @ inv_jtj @ Jq.T
    B = np.linalg.inv(A + np.eye(2))
    scale = get_outlierness_scale(float(r.norm2_x), sp.NMEAS, sp.NSTATE,
                                  0, 2)
    np.testing.assert_allclose(float(got), float(scale) * (2 - np.trace(B)),
                               rtol=1e-9)
    # confidence is higher (more outliery-looking) where data is dense:
    # a query Jacobian of zeros has A=0, B=I, trace=fs -> trace result 0.
    zero = outlierness_trace_new_feature(jnp.zeros((2, sp.NSTATE)), fac.L,
                                         r.norm2_x, sp.NMEAS)
    np.testing.assert_allclose(float(zero), 0.0, atol=1e-12)


def test_trace_new_feature_sparse_factor():
    """Query-point confidence off a block-sparse factor (solve_fn) matches
    the dense-factor result."""
    from libdogleg_tpu import sparse_cholesky as sc
    from libdogleg_tpu.analysis import outlierness_trace_new_feature
    from libdogleg_tpu.ops.cholesky import factorize_jtj

    rng = np.random.default_rng(9)
    nb, b = 6, 2
    nstate = nb * b
    J = rng.normal(size=(40, nstate))
    JtJ = J.T @ J
    # dense factor
    fac = factorize_jtj(jnp.asarray(JtJ), jnp.asarray(0.0))
    Jq = jnp.asarray(rng.normal(size=(2, nstate)))
    t_ref = outlierness_trace_new_feature(Jq, fac.L, jnp.asarray(12.0), 40)
    # block-sparse factor of the same (dense-pattern) matrix
    rows, cols = zip(*[(i, j) for i in range(nb) for j in range(i + 1)])
    rows, cols = np.asarray(rows), np.asarray(cols)
    blocks = jnp.asarray(np.stack(
        [JtJ[i*b:(i+1)*b, j*b:(j+1)*b] for i, j in zip(rows, cols)]))
    sym = sc.analyze(rows, cols, nb, b)
    L, ok = sc.factorize(sym, blocks, jnp.asarray(0.0))
    assert bool(ok)
    t_sp = outlierness_trace_new_feature(
        Jq, None, jnp.asarray(12.0), 40,
        solve_fn=lambda r: sc.solve(sym, L, r))
    np.testing.assert_allclose(float(t_sp), float(t_ref), rtol=1e-9)


def test_trace_new_features_windowed_matches_dense():
    """The windowed batched query-point confidence (reference
    istateActive/NstateActive contract, dogleg.c:2794-2842) equals the
    dense zero-padded form query by query, for several window positions,
    widths narrower than w (zero-padded rows), and feature sizes."""
    from libdogleg_tpu.analysis import (
        outlierness_trace_new_feature,
        outlierness_trace_new_features_windowed)

    rng = np.random.default_rng(21)
    nstate, nmeas = 24, 96
    J = rng.normal(size=(nmeas, nstate))
    fac = factorize_jtj(jnp.asarray(J.T @ J), jnp.asarray(0.0))
    norm2x = jnp.asarray(37.5)

    for fs, w in [(1, 4), (2, 5), (3, 6)]:
        nq = 7
        starts = np.array([0, 3, 11, nstate - w, 5, 8, 2])
        Jq_win = rng.normal(size=(nq, fs, w))
        Jq_win[1, :, -2:] = 0.0   # a narrower window, zero-padded
        got = outlierness_trace_new_features_windowed(
            jnp.asarray(Jq_win), jnp.asarray(starts), fac.L, norm2x, nmeas)
        assert got.shape == (nq,)
        for q in range(nq):
            Jq = np.zeros((fs, nstate))
            Jq[:, starts[q]:starts[q] + w] = Jq_win[q]
            ref = outlierness_trace_new_feature(jnp.asarray(Jq), fac.L,
                                                norm2x, nmeas)
            np.testing.assert_allclose(float(got[q]), float(ref),
                                       rtol=1e-9, atol=1e-12)


def test_trace_new_features_windowed_out_of_range():
    """Out-of-range windows follow the documented contract: columns
    falling outside [0, nstate) contribute exactly zero (matching the
    dense form on a Jq with those columns dropped), and fully
    out-of-range queries return exactly 0 — never a plausible-looking
    wrong trace from clamped/wrapped indices."""
    from libdogleg_tpu.analysis import (
        outlierness_trace_new_feature,
        outlierness_trace_new_features_windowed)

    rng = np.random.default_rng(23)
    nstate, nmeas, fs, w = 24, 96, 2, 5
    J = rng.normal(size=(nmeas, nstate))
    fac = factorize_jtj(jnp.asarray(J.T @ J), jnp.asarray(0.0))
    norm2x = jnp.asarray(37.5)

    starts = np.array([-3, 22, 30, -10, 4])   # partial / partial / fully
    Jq_win = rng.normal(size=(len(starts), fs, w))
    got = outlierness_trace_new_features_windowed(
        jnp.asarray(Jq_win), jnp.asarray(starts), fac.L, norm2x, nmeas)
    for q, s in enumerate(starts):
        Jq = np.zeros((fs, nstate))
        lo, hi = max(s, 0), min(s + w, nstate)
        if lo < hi:
            Jq[:, lo:hi] = Jq_win[q][:, lo - s:hi - s]
        ref = outlierness_trace_new_feature(jnp.asarray(Jq), fac.L,
                                            norm2x, nmeas)
        np.testing.assert_allclose(float(got[q]), float(ref),
                                   rtol=1e-9, atol=1e-12)
    assert float(got[2]) == 0.0 and float(got[3]) == 0.0


def test_trace_new_features_windowed_sparse_factor():
    """Windowed batched queries against a block-sparse factor (solve_fn)
    match the dense-factor result."""
    from libdogleg_tpu import sparse_cholesky as sc
    from libdogleg_tpu.analysis import (
        outlierness_trace_new_features_windowed)

    rng = np.random.default_rng(22)
    nb, b = 8, 2
    nstate = nb * b
    J = rng.normal(size=(64, nstate))
    JtJ = J.T @ J
    fac = factorize_jtj(jnp.asarray(JtJ), jnp.asarray(0.0))
    rows, cols = zip(*[(i, j) for i in range(nb) for j in range(i + 1)])
    rows, cols = np.asarray(rows), np.asarray(cols)
    blocks = jnp.asarray(np.stack(
        [JtJ[i*b:(i+1)*b, j*b:(j+1)*b] for i, j in zip(rows, cols)]))
    sym = sc.analyze(rows, cols, nb, b)
    Lb, ok = sc.factorize(sym, blocks, jnp.asarray(0.0))
    assert bool(ok)

    nq, fs, w = 5, 2, 4
    Jq_win = jnp.asarray(rng.normal(size=(nq, fs, w)))
    starts = jnp.asarray(np.array([0, 4, 7, 12, 2]))
    t_dense = outlierness_trace_new_features_windowed(
        Jq_win, starts, fac.L, jnp.asarray(10.0), 64)
    t_sp = outlierness_trace_new_features_windowed(
        Jq_win, starts, None, jnp.asarray(10.0), 64, nstate=nstate,
        solve_fn=lambda r: sc.solve(sym, Lb, r))
    np.testing.assert_allclose(np.asarray(t_sp), np.asarray(t_dense),
                               rtol=1e-9)


def test_ba_outlierness_matches_dense_oracle():
    """get_outlierness_factors_ba computes the reference's featureSize-2
    Cook's factors from the sparse-W Schur factors (9x9 covariance blocks
    by block-inverse identities, point-chunked) — identical to the dense-J
    entry point on the fully densified system."""
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.analysis import (get_outlierness_factors,
                                        get_outlierness_factors_ba)
    from libdogleg_tpu.models import pinhole_ba
    from libdogleg_tpu.solver import solve_products

    ba = pinhole_ba.make_synthetic_sparse(seed=3, ncam=6, npts=60, k_obs=3)
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    r = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=ba.newton_solver()))(p0["c"], p0["q"])
    p = {"c": r.p["c"], "q": r.p["q"]}
    lam = float(r.lam)

    robs, Jc, Jq = ba.observation_jacobians(p)
    nc = ba.ncam * 6
    nmeas_total = 2 * ba.nobs + 6 + 3 * ba.npts
    fac_ba, scale_ba = get_outlierness_factors_ba(
        robs, Jc, Jq, r.JtJ, lam, r.norm2_x, nmeas_total,
        ba.newton_solver(), chunk=16)   # chunk < npts: chunked path

    # dense oracle: proj rows first (feature pairs), then prior rows
    nstate = ba.nstate
    J = np.zeros((nmeas_total, nstate))
    x = np.zeros(nmeas_total)
    row = 0
    cam_of = np.asarray(ba.cam_of)
    for pi in range(ba.npts):
        for kk in range(ba.k_obs):
            ci = int(cam_of[pi, kk])
            for a in range(2):
                x[row] = float(robs[pi, kk, a])
                J[row, ci * 6:(ci + 1) * 6] = np.asarray(Jc[pi, kk, a])
                J[row, nc + 3 * pi:nc + 3 * pi + 3] = \
                    np.asarray(Jq[pi, kk, a])
                row += 1
    sw0 = np.sqrt(ba.w_prior_cam0)
    swp = np.sqrt(ba.w_prior_pts)
    pc = np.asarray(p["c"])
    q = np.asarray(p["q"])
    for i in range(6):
        x[row] = sw0 * (pc[i] - float(ba.cam0_prior[i]))
        J[row, i] = sw0
        row += 1
    for pi in range(ba.npts):
        for j in range(3):
            x[row] = swp * (q[pi, j] - float(ba.pts_prior[pi, j]))
            J[row, nc + 3 * pi + j] = swp
            row += 1
    assert row == nmeas_total

    fac = factorize_jtj(jnp.asarray(J.T @ J), jnp.asarray(lam))
    fd, scale_d = get_outlierness_factors(jnp.asarray(x), jnp.asarray(J),
                                          fac.L, feature_size=2)
    np.testing.assert_allclose(float(scale_ba), float(scale_d), rtol=1e-10)
    fd_obs = np.asarray(fd)[:ba.nobs].reshape(ba.npts, ba.k_obs)
    np.testing.assert_allclose(np.asarray(fac_ba), fd_obs,
                               rtol=1e-7, atol=1e-10)


def test_ba_outlierness_factor_reuse():
    """Passing a precomputed solver.factor(JtJ, lam) handle (the public
    cached-factorization contract, reference dogleg.c:2636-2652) yields
    bit-identical factors to letting the pass refactorize, and the
    public method agrees with what the solve used."""
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.analysis import get_outlierness_factors_ba
    from libdogleg_tpu.models import pinhole_ba
    from libdogleg_tpu.solver import solve_products

    ba = pinhole_ba.make_synthetic_sparse(seed=5, ncam=4, npts=40, k_obs=2)
    solver = ba.newton_solver()
    p0 = ba.p0(jax.random.PRNGKey(1), jitter=0.02)
    r = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, DoglegParameters(),
        newton_solver=solver))(p0["c"], p0["q"])
    p = {"c": r.p["c"], "q": r.p["q"]}
    JtJ = ba.products(p).JtJ
    robs, Jc, Jq = ba.observation_jacobians(p)
    nmeas_total = 2 * ba.nobs + 6 + 3 * ba.npts

    fac = solver.factor(JtJ, r.lam)
    assert bool(fac[1])
    f_reused, s1 = get_outlierness_factors_ba(
        robs, Jc, Jq, JtJ, r.lam, r.norm2_x, nmeas_total, solver,
        factorization=fac)
    f_fresh, s2 = get_outlierness_factors_ba(
        robs, Jc, Jq, JtJ, r.lam, r.norm2_x, nmeas_total, solver)
    assert float(s1) == float(s2)
    np.testing.assert_array_equal(np.asarray(f_reused),
                                  np.asarray(f_fresh))
