"""Full benchmark matrix: the five BASELINE.json configurations plus two.

bench.py stays the driver's single-JSON-line headline (config 3); this
script measures every config and prints one JSON line per config.
Runs on whatever backend the environment provides (the tunneled TPU here).

  1. sparse sample.c problem (block-CSR path), single-solve latency
  2. dense path: small dense-Jacobian curve fit, single-solve latency
  3. batched trust-region: 10k independent small problems vmapped per chip
  4. large block-sparse BA-style problem: Schur elimination of point blocks
  5. covariance/outlierness pass from the factored JtJ
  6. large sparse grid MRF: supernodal block-sparse Cholesky vs dense JtJ
  7. nonlinear pinhole-camera bundle adjustment (the reference's domain)
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

import libdogleg_tpu.models.quadratic_surface as sp
from libdogleg_tpu import DoglegParameters, optimize
from libdogleg_tpu.analysis import get_outlierness_factors
from libdogleg_tpu.models import (bundle_adjustment, curve_fit, grid_mrf,
                                  pinhole_ba)
from libdogleg_tpu.ops.cholesky import factorize_jtj
from libdogleg_tpu.solver import Products, solve_products
from libdogleg_tpu.utils.benchtime import fetch, measure_loop

DTYPE = jnp.float32
PRM = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                       update_threshold=1e-5, trustregion_threshold=1e-5)


def timeit(fn, *args):
    """(per-call device seconds, one real output). Dependent-loop timing —
    see utils.benchtime for why naive wall-clock is wrong here; rep counts
    are self-budgeted by measure_loop."""
    out = fn(*args)
    fetch(out)
    return measure_loop(fn, *args), out


def emit(config, metric, value, unit, **extra):
    print(json.dumps({"config": config, "metric": metric,
                      "value": round(float(value), 3), "unit": unit,
                      **extra}))


def config1_sparse():
    meas = sp.simulate(jax.random.PRNGKey(0), dtype=DTYPE)
    p0 = sp.initial_state(jax.random.PRNGKey(1), dtype=DTYPE)
    problem = sp.make_sparse_problem(meas)
    f = jax.jit(lambda q: optimize(problem, q, PRM).p)
    dt, out = timeit(f, p0)
    emit("1-sparse-sample", "single_solve_latency", dt * 1e6, "us",
         recovered=bool(np.all(np.abs(np.asarray(out) - sp.P_TRUE) < 0.2)))


def config2_dense():
    meas = curve_fit.simulate(jax.random.PRNGKey(0), dtype=DTYPE)
    p0 = curve_fit.initial_state(jax.random.PRNGKey(1), dtype=DTYPE)
    problem = curve_fit.make_dense_problem(meas)
    f = jax.jit(lambda q: optimize(problem, q, PRM).p)
    dt, out = timeit(f, p0)
    emit("2-dense-curvefit", "single_solve_latency", dt * 1e6, "us",
         recovered=bool(np.all(
             np.abs(np.asarray(out) - curve_fit.P_TRUE) < 0.2)))


def config3_batched(batch=10000):
    gx, gy = sp.make_grid(DTYPE)

    def products(p, meas):
        x = sp.model(p, gx, gy) - meas
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x, Jt_x=J.T @ x, JtJ=J.T @ J)

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=DTYPE))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(1), batch))
    from libdogleg_tpu.parallel.batched import batched_optimize_compacted
    f = jax.jit(lambda p0s, m: batched_optimize_compacted(
        products, p0s, PRM, problem_data=m).p)  # auto-tuned compaction
    dt, out = timeit(f, p0s, meas)
    err = np.abs(np.asarray(out) - sp.P_TRUE[None])
    emit("3-batched-10k", "batched_solves_per_s", batch / dt, "solves/s",
         vs_baseline=round(batch / dt / 1e4, 2),
         recovered_frac=round(float(np.mean(np.all(err < 0.2, -1))), 4))


def config4_ba_schur(nc=64, n_points=20000, bs=3, k_obs=4):
    ba = bundle_adjustment.make_synthetic(
        seed=0, nc=nc, n_points=n_points, block_size=bs, k_obs=k_obs,
        dtype=DTYPE)
    f = jax.jit(lambda p0: solve_products(ba.products, p0, PRM,
                                          newton_solver=ba.newton_solver()
                                          ).norm2_x)
    dt, out = timeit(f, jnp.zeros(ba.nstate, DTYPE))
    emit("4-ba-schur", "solve_latency", dt * 1e3, "ms",
         nstate=ba.nstate, nmeas=ba.nmeasurements,
         converged=bool(np.asarray(out) < 1e-3))


def config5_outlierness(nmeas=100000, nstate=64, feature_size=2):
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.normal(size=(nmeas, nstate)), DTYPE)
    x = jnp.asarray(rng.normal(size=(nmeas,)), DTYPE)
    JtJ = jnp.matmul(J.T, J, preferred_element_type=DTYPE)

    def pass_(J, x, JtJ):
        fac = factorize_jtj(JtJ, jnp.asarray(0.0, DTYPE))
        factors, _ = get_outlierness_factors(x, J, fac.L,
                                             feature_size=feature_size)
        return factors

    f = jax.jit(pass_)
    dt, out = timeit(f, J, x, JtJ)
    emit("5-outlierness", "features_per_s",
         (nmeas // feature_size) / dt, "features/s",
         nmeas=nmeas, nstate=nstate)


def config6_sparse_grid(width=32, height=32, b=8, amalgamate=16,
                        label="6-sparse-grid-mrf", with_dense=True):
    """Large sparse single problem: RCM-ordered supernodal amalgamation vs
    the dense-JtJ path on the same instance. The supernodal block-sparse
    Cholesky is where sparsity starts beating the MXU's love of dense —
    the TPU analog of the reference's "massive performance gains" claim
    (README.pod:19-21)."""
    m = grid_mrf.make_grid_mrf(width=width, height=height, block_size=b,
                               dtype=DTYPE)
    from libdogleg_tpu.problems import SparseProblem
    base = m.problem(jtj="dense")
    sp_prob = SparseProblem(f=base.f, structure=base.structure,
                            jtj="sparse", ordering="rcm",
                            amalgamate=amalgamate)
    ns = sp_prob.default_newton_solver()
    f_sp = jax.jit(lambda p0: optimize(sp_prob, p0, PRM,
                                       newton_solver=ns).norm2_x)
    dt_sp, out = timeit(f_sp, jnp.zeros(m.nstate, DTYPE))
    extra = {}
    if with_dense:
        f_d = jax.jit(lambda p0: optimize(base, p0, PRM).norm2_x)
        dt_d, _ = timeit(f_d, jnp.zeros(m.nstate, DTYPE))
        extra = dict(dense_mode_ms=round(dt_d * 1e3, 2),
                     sparse_speedup_vs_dense=round(dt_d / dt_sp, 2))
    inner = ns.symbolic.inner
    emit(label, "solve_latency", dt_sp * 1e3, "ms",
         nstate=m.nstate, n_nodes=m.n_nodes, amalgamate=amalgamate,
         super_levels=inner.sched.nlevels, super_block=inner.b,
         converged=bool(np.isfinite(np.asarray(out))), **extra)


def config7_pinhole_ba(ncam=32, npts=20000):
    """Nonlinear pinhole-camera bundle adjustment — the reference's actual
    application domain (README.pod:5-15): reprojection errors, autodiff
    per-observation Jacobians, Schur elimination on pytree states."""
    ba = pinhole_ba.make_synthetic(seed=0, ncam=ncam, npts=npts,
                                   dtype=DTYPE)
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    f = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, PRM,
        newton_solver=ba.newton_solver()).norm2_x)
    dt, out = timeit(f, p0["c"], p0["q"])
    nobs_res = 2 * ba.nobs
    emit("7-pinhole-ba", "solve_latency", dt * 1e3, "ms",
         ncam=ncam, npts=npts, nobs=ba.nobs, nstate=ba.nstate,
         converged=bool(np.asarray(out) < 1.0 * nobs_res))


def config7s_sparse_visibility_ba(ncam=128, npts=50000, k_obs=4,
                                  label="7s-sparse-vis-ba"):
    """Large sparse-visibility bundle adjustment: each point seen by k_obs
    of the 128 cameras. The dense coupling W of SchurJtJ would be
    nc x npts x 3 f32 = 460 MB here and is never built — SparseWSchurJtJ
    stores the 14 MB of actual nonzero blocks and the solver reduces over
    the camera axis with one-hot MXU einsums (ops/newton.py). A scale the
    dense-W path cannot reach on one chip."""
    ba = pinhole_ba.make_synthetic_sparse(seed=0, ncam=ncam, npts=npts,
                                          k_obs=k_obs, dtype=DTYPE)
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    f = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, PRM,
        newton_solver=ba.newton_solver()).norm2_x)
    dt, out = timeit(f, p0["c"], p0["q"])
    emit(label, "solve_latency", dt * 1e3, "ms",
         ncam=ncam, npts=npts, k_obs=k_obs, nobs=ba.nobs,
         nstate=ba.nstate,
         converged=bool(np.asarray(out) < 1.0 * 2 * ba.nobs))


def config7o_ba_outlierness(ncam=128, npts=50000, k_obs=4):
    """Observation-level outlierness at BA scale: the featureSize-2 Cook's
    factors for every observation from the sparse-W Schur factors
    (analysis.get_outlierness_factors_ba) — no dense J or factor ever
    exists."""
    from libdogleg_tpu.analysis import get_outlierness_factors_ba
    ba = pinhole_ba.make_synthetic_sparse(seed=0, ncam=ncam, npts=npts,
                                          k_obs=k_obs, dtype=DTYPE)
    solver = ba.newton_solver()
    p0 = ba.p0(jax.random.PRNGKey(2), jitter=0.02)
    r = jax.jit(lambda pc, pq: solve_products(
        ba.products, {"c": pc, "q": pq}, PRM,
        newton_solver=solver))(p0["c"], p0["q"])
    fetch(r.norm2_x)
    nmeas = 2 * ba.nobs + 6 + 3 * ba.npts
    # the solve's factorization, recomputed once via the public handle and
    # REUSED by the pass — the reference's cached-factor semantics
    # (dogleg.c:2636-2652); the pass itself no longer refactorizes
    fac = jax.jit(lambda pc, pq, lam: solver.factor(
        ba.products({"c": pc, "q": pq}).JtJ, lam))(
            r.p["c"], r.p["q"], r.lam)
    fetch(fac)

    def outl(pc, pq, lam, n2, fac):
        robs, Jc, Jq = ba.observation_jacobians({"c": pc, "q": pq})
        JtJ = ba.products({"c": pc, "q": pq}).JtJ
        f, _ = get_outlierness_factors_ba(robs, Jc, Jq, JtJ, lam, n2,
                                          nmeas, solver,
                                          factorization=fac)
        return f

    f = jax.jit(outl)
    dt, out = timeit(f, r.p["c"], r.p["q"], r.lam, r.norm2_x, fac)
    emit("7o-ba-outlierness", "pass_latency", dt * 1e3, "ms",
         nobs=ba.nobs, nstate=ba.nstate, obs_per_s=round(ba.nobs / dt),
         finite=bool(np.isfinite(np.asarray(out)).all()))


def config8_batched_midsize(nstate=64, batch=512, meas_factor=4):
    """Mid-size batched throughput: dense Nstate=64/128 problems, the
    regime ABOVE smallchol.SMALL_N_MAX=16 where the batch rides the
    blocked lax.linalg Cholesky (multi-camera-calibration scale). The
    Nstate=6 headline (config 3) says nothing about this branch; this
    config tracks it. Problem family: the random-parity tanh residuals
    r = A tanh(Bp) + Cp - d with analytic J (one instance per element)."""
    nmeas = meas_factor * nstate
    rng = np.random.default_rng(8)
    A = jnp.asarray(rng.normal(size=(batch, nmeas, nstate)), DTYPE)
    Bm = jnp.asarray(rng.normal(size=(batch, nstate, nstate)) * 0.5
                     / np.sqrt(nstate), DTYPE)
    C = jnp.asarray(rng.normal(size=(batch, nmeas, nstate)) * 0.3, DTYPE)
    p_true = rng.normal(size=(batch, nstate))
    d_np = (np.einsum('bms,bs->bm', np.asarray(A),
                      np.tanh(np.einsum('bst,bt->bs', np.asarray(Bm),
                                        p_true)))
            + np.einsum('bms,bs->bm', np.asarray(C), p_true)
            + rng.normal(size=(batch, nmeas)) * 0.01)
    d = jnp.asarray(d_np, DTYPE)
    p0s = jnp.asarray(p_true + rng.normal(size=(batch, nstate)) * 0.1,
                      DTYPE)

    def products(p, data):
        Ab, Bb, Cb, db = data
        t = jnp.tanh(Bb @ p)
        x = Ab @ t + Cb @ p - db
        J = jnp.matmul(Ab, ((1.0 - t * t)[:, None]) * Bb,
                       preferred_element_type=DTYPE) + Cb
        return Products(norm2_x=x @ x, Jt_x=J.T @ x,
                        JtJ=jnp.matmul(J.T, J,
                                       preferred_element_type=DTYPE))

    from libdogleg_tpu.parallel.batched import batched_optimize
    f = jax.jit(lambda q, data: batched_optimize(
        products, q, PRM, problem_data=data).p)
    dt, out = timeit(f, p0s, (A, Bm, C, d))
    err = np.abs(np.asarray(out) - p_true)
    emit(f"8-batched-n{nstate}", "batched_solves_per_s", batch / dt,
         "solves/s", nstate=nstate, nmeas=nmeas, batch=batch,
         recovered_frac=round(float(np.mean(np.all(err < 0.05, -1))), 4))


if __name__ == "__main__":
    config1_sparse()
    config2_dense()
    config3_batched()
    config4_ba_schur()
    config5_outlierness()
    config6_sparse_grid()
    # 4x the grid: dense JtJ would be 4.3 GB — sparse-only scale point
    config6_sparse_grid(width=64, height=64, label="6b-sparse-grid-64x64",
                        with_dense=False)
    config7_pinhole_ba()
    config7s_sparse_visibility_ba()
    config7s_sparse_visibility_ba(ncam=256, npts=200000, k_obs=4,
                                  label="7xl-sparse-vis-ba")
    config7o_ba_outlierness()
    config8_batched_midsize(nstate=64, batch=512)
    config8_batched_midsize(nstate=128, batch=256)
