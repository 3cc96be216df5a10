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
