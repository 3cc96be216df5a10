"""Megakernel auto-promotion (parallel/mega_auto.py): batched_optimize
selects the whole-solve Pallas kernel for the regime it covers, adapting
the user's ORDINARY per-element products function (closed-over array
constants hoisted into kernel inputs, vmap to the batch-minor lane form)
— no Pallas in the caller's code.

Follows test_pallas_mega.py's parity framework: f64 decisions must match
the XLA path EXACTLY (roundoff sits far below every threshold); f32 may
flip knife-edge threshold ties between reduction orders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import libdogleg_tpu.models.quadratic_surface as sp
from libdogleg_tpu import DoglegParameters
from libdogleg_tpu.parallel.batched import (batched_optimize,
                                            batched_optimize_compacted)
from libdogleg_tpu.parallel.mega_auto import (adapt_products_minor,
                                              plan_megakernel)
from libdogleg_tpu.solver import Products


def _setup(dtype, batch):
    gx, gy = sp.make_grid(dtype)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(0), batch))
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), batch))

    def products(p, m):
        # closes over gx, gy: exercises const hoisting into shared_data
        x = sp.model(p, gx, gy) - m
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x, Jt_x=J.T @ x, JtJ=J.T @ J)

    return meas, p0s, products


def _assert_decisions_equal(r, r_ref):
    np.testing.assert_array_equal(np.asarray(r.step_count),
                                  np.asarray(r_ref.step_count))
    np.testing.assert_array_equal(np.asarray(r.reason),
                                  np.asarray(r_ref.reason))
    np.testing.assert_array_equal(np.asarray(r.n_attempts),
                                  np.asarray(r_ref.n_attempts))


def test_forced_f64_decision_exact():
    meas, p0s, products = _setup(jnp.float64, 128)
    prm = DoglegParameters()
    r_ref = batched_optimize(products, p0s, prm, problem_data=meas,
                             use_megakernel=False)
    r = batched_optimize(products, p0s, prm, problem_data=meas,
                         use_megakernel=True)
    _assert_decisions_equal(r, r_ref)
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(r_ref.p),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r.JtJ), np.asarray(r_ref.JtJ),
                               rtol=1e-10, atol=1e-10)


def test_forced_padding_non_multiple_batch():
    """B=100 is no multiple of any lane tile: the plan pads with copies
    of element 0 and slices back; results must be exact and full-size."""
    meas, p0s, products = _setup(jnp.float64, 100)
    prm = DoglegParameters()
    r_ref = batched_optimize(products, p0s, prm, problem_data=meas,
                             use_megakernel=False)
    r = batched_optimize(products, p0s, prm, problem_data=meas,
                         use_megakernel=True)
    assert r.p.shape == (100, sp.NSTATE)
    _assert_decisions_equal(r, r_ref)
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(r_ref.p),
                               rtol=1e-10, atol=1e-12)


def test_forced_shared_problem_data_none():
    """products_fn with NO problem_data (shared measurements, distinct
    starts): everything the function closes over rides shared_data."""
    meas, p0s, products = _setup(jnp.float64, 128)
    m0 = meas[0]
    shared_products = lambda p: products(p, m0)
    prm = DoglegParameters()
    r_ref = batched_optimize(shared_products, p0s, prm,
                             use_megakernel=False)
    r = batched_optimize(shared_products, p0s, prm, use_megakernel=True)
    _assert_decisions_equal(r, r_ref)
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(r_ref.p),
                               rtol=1e-10, atol=1e-12)


def test_compacted_promotion_matches():
    meas, p0s, products = _setup(jnp.float64, 128)
    prm = DoglegParameters()
    r_ref = batched_optimize_compacted(products, p0s, prm,
                                       problem_data=meas,
                                       use_megakernel=False)
    r = batched_optimize_compacted(products, p0s, prm, problem_data=meas,
                                   use_megakernel=True)
    _assert_decisions_equal(r, r_ref)
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(r_ref.p),
                               rtol=1e-10, atol=1e-12)


def test_forced_mesh_composition():
    """Promotion composes with the dp mesh (8 virtual CPU devices):
    each device runs the kernel on its local slice, zero communication."""
    from libdogleg_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(("dp",))
    B = 8 * 128
    meas, p0s, products = _setup(jnp.float64, B)
    prm = DoglegParameters()
    r_ref = batched_optimize(products, p0s, prm, problem_data=meas,
                             use_megakernel=False)
    r = batched_optimize(products, p0s, prm, problem_data=meas,
                         mesh=mesh, use_megakernel=True)
    _assert_decisions_equal(r, r_ref)
    np.testing.assert_allclose(np.asarray(r.p), np.asarray(r_ref.p),
                               rtol=1e-10, atol=1e-12)


def test_forced_under_outer_jit():
    """A caller may jit around batched_optimize; the plan must trace the
    kernel INLINE there (an AOT executable cannot take tracers) while
    keeping the eager compile probe. Decisions identical either way."""
    meas, p0s, products = _setup(jnp.float64, 128)
    prm = DoglegParameters()
    r_eager = batched_optimize(products, p0s, prm, problem_data=meas,
                               use_megakernel=True)
    r_jit = jax.jit(lambda q, m: batched_optimize(
        products, q, prm, problem_data=m, use_megakernel=True))(
            p0s, meas)
    _assert_decisions_equal(r_jit, r_eager)
    np.testing.assert_allclose(np.asarray(r_jit.p),
                               np.asarray(r_eager.p),
                               rtol=1e-12, atol=1e-14)


def test_f32_near_total_agreement():
    meas, p0s, products = _setup(jnp.float32, 256)
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)
    r_ref = batched_optimize(products, p0s, prm, problem_data=meas,
                             use_megakernel=False)
    r = batched_optimize(products, p0s, prm, problem_data=meas,
                         use_megakernel=True)
    same = (np.asarray(r.step_count) == np.asarray(r_ref.step_count))
    assert np.mean(same) > 0.85
    err = np.abs(np.asarray(r.p) - sp.P_TRUE[None])
    assert np.mean(np.all(err < 0.2, axis=1)) > 0.95


def test_auto_is_off_outside_regime():
    """plan_megakernel returns None where the kernel can't go: non-TPU
    auto, tiny batches, big Nstate, structured JtJ."""
    meas, p0s, products = _setup(jnp.float32, 2048)
    prm = DoglegParameters()
    # auto on a CPU backend: interpret mode is not a fast path
    assert plan_megakernel(products, p0s, prm, problem_data=meas,
                           forced=False) is None
    # batch below the compile-amortization floor
    assert plan_megakernel(products, p0s[:256], prm,
                           problem_data=meas[:256], forced=False,
                           interpret=False) is None
    # Nstate beyond the unroll/VMEM cap
    big = jnp.zeros((2048, 32), jnp.float32)

    def big_products(p):
        return Products(norm2_x=p @ p, Jt_x=p, JtJ=jnp.eye(32))

    assert plan_megakernel(big_products, big, prm, forced=False,
                           interpret=False) is None


def test_forced_errors_are_loud():
    meas, p0s, products = _setup(jnp.float32, 128)
    with pytest.raises(ValueError, match="record_history"):
        batched_optimize(products, p0s, problem_data=meas,
                         record_history=True, use_megakernel=True)

    def structured(p):
        return Products(norm2_x=p @ p, Jt_x=p,
                        JtJ={"diag": jnp.ones_like(p)})

    with pytest.raises(Exception):
        batched_optimize(structured, p0s, use_megakernel=True)


def test_adapter_hoists_consts():
    """The adapter must trace out closed-over arrays as explicit shared
    inputs (Pallas kernels cannot capture array constants)."""
    meas, p0s, products = _setup(jnp.float32, 128)
    pm, shared, nd = adapt_products_minor(products, p0s[0], meas[0])
    assert nd == 1
    assert len(shared) >= 2  # at least gx and gy
    # and the adapted function reproduces the per-element products in
    # batch-minor form
    bt = 8
    p_m = p0s[:bt].T
    m_m = meas[:bt].T
    n2, jtx, jtj = pm(p_m, m_m, *shared)
    ref = jax.vmap(products)(p0s[:bt], meas[:bt])
    np.testing.assert_allclose(np.asarray(n2[0]),
                               np.asarray(ref.norm2_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jtx), np.asarray(ref.Jt_x.T),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jtj),
                               np.asarray(jnp.moveaxis(ref.JtJ, 0, -1)),
                               rtol=1e-5, atol=1e-4)
