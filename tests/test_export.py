"""AOT export (libdogleg_tpu/export.py): the serving deployment story.

The artifact must round-trip through pure bytes and reproduce the live
jitted solve exactly (same trajectories — it IS the same lowered program),
for both the single and batched configurations, with problem data baked
in as constants.
"""

import jax
import jax.numpy as jnp
import numpy as np

import libdogleg_tpu.sample_problem as sp
from libdogleg_tpu import DenseProblem, DoglegParameters, optimize
from libdogleg_tpu.export import export_solver, load_exported, save_exported


def _sample_products():
    meas = sp.simulate(jax.random.PRNGKey(0))
    return sp.make_dense_problem(meas).products, meas


def test_export_roundtrip_single(tmp_path):
    products, meas = _sample_products()
    prm = DoglegParameters(max_iterations=8)
    exp = export_solver(products, nstate=sp.NSTATE, parameters=prm,
                        dtype=jnp.float64)
    path = tmp_path / "solver.bin"
    save_exported(str(path), exp)
    assert path.stat().st_size > 0

    solve = load_exported(str(path))
    p0 = sp.initial_state(jax.random.PRNGKey(1))
    r = solve.call(p0)

    r_ref = jax.jit(lambda q: optimize(sp.make_dense_problem(meas),
                                       q, prm))(p0)
    assert int(r.step_count) == int(r_ref.step_count)
    np.testing.assert_array_equal(np.asarray(r.p), np.asarray(r_ref.p))
    assert np.abs(np.asarray(r.p) - np.asarray(sp.P_TRUE)).max() < 5e-2


def test_export_roundtrip_batched(tmp_path):
    meas = sp.simulate(jax.random.PRNGKey(0))
    gx, gy = sp.make_grid(jnp.float64)

    from libdogleg_tpu.solver import Products

    def products(p):
        x = sp.model(p, gx, gy) - meas
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x, Jt_x=J.T @ x, JtJ=J.T @ J)

    batch = 16
    prm = DoglegParameters(max_iterations=8)
    exp = export_solver(products, nstate=sp.NSTATE, parameters=prm,
                        batch_size=batch, dtype=jnp.float64)
    path = tmp_path / "batched.bin"
    save_exported(str(path), exp)
    solve = load_exported(str(path))

    p0s = jax.vmap(sp.initial_state)(
        jax.random.split(jax.random.PRNGKey(1), batch))
    r = solve.call(p0s)
    assert r.p.shape == (batch, sp.NSTATE)
    err = np.abs(np.asarray(r.p) - np.asarray(sp.P_TRUE)[None])
    assert float(np.mean(np.all(err < 5e-2, axis=1))) > 0.9


def test_export_sparse_problem(tmp_path):
    """The block-sparse path exports too: BCSR structure (and, for
    jtj='sparse', level schedules) bake into the artifact."""
    meas = sp.simulate(jax.random.PRNGKey(0))
    prob = sp.make_sparse_problem(meas)
    prm = DoglegParameters(max_iterations=8)
    exp = export_solver(prob.products, nstate=sp.NSTATE, parameters=prm,
                        newton_solver=prob.default_newton_solver(),
                        dtype=jnp.float64)
    path = tmp_path / "sparse.bin"
    save_exported(str(path), exp)
    p0 = sp.initial_state(jax.random.PRNGKey(1))
    r = load_exported(str(path)).call(p0)
    r_live = jax.jit(lambda q: optimize(prob, q, prm))(p0)
    np.testing.assert_array_equal(np.asarray(r.p), np.asarray(r_live.p))


def test_export_pytree_state_ba():
    """Pytree-state solves (Schur BA, structured JtJ in the result)
    serialize through the registered NamedTuple names."""
    from jax import export as jx

    from libdogleg_tpu.models import pinhole_ba
    from libdogleg_tpu.solver import solve_products

    ba = pinhole_ba.make_synthetic_sparse(seed=1, ncam=6, npts=80, k_obs=3)
    q0 = ba.p0(jax.random.PRNGKey(3), jitter=0.02)

    def solve(p):
        return solve_products(ba.products, p, DoglegParameters(),
                              newton_solver=ba.newton_solver())

    exp = jx.export(jax.jit(solve))(
        {"c": jax.ShapeDtypeStruct(q0["c"].shape, q0["c"].dtype),
         "q": jax.ShapeDtypeStruct(q0["q"].shape, q0["q"].dtype)})
    r = jx.deserialize(exp.serialize()).call(q0)
    r_live = jax.jit(solve)(q0)
    assert int(r.step_count) == int(r_live.step_count)
    np.testing.assert_array_equal(np.asarray(r.p["q"]),
                                  np.asarray(r_live.p["q"]))
