"""Segmented solving and checkpoint/resume: a sliced run must reproduce the
one-shot solve exactly (all solver caches live in the state pytree)."""

import jax
import jax.numpy as jnp
import numpy as np

import libdogleg_tpu.sample_problem as sp
from libdogleg_tpu import DoglegParameters
from libdogleg_tpu.checkpoint import load_state, save_state
from libdogleg_tpu.solver import (init_solver_state, result_from_state,
                                  run_solver, solve_products, StopReason)


def _problem():
    meas = sp.simulate(jax.random.PRNGKey(0))
    p0 = sp.initial_state(jax.random.PRNGKey(1))
    return sp.make_dense_problem(meas).products, p0


def test_segmented_run_matches_one_shot():
    products, p0 = _problem()
    ref = solve_products(products, p0)

    state = init_solver_state(products, p0)
    for _ in range(20):  # 20 slices of 1 attempt each
        state = run_solver(products, state, max_new_attempts=1)
        if bool(state.done):
            break
    got = result_from_state(state)
    # identical trajectory; values may differ by XLA fusion rounding across
    # the differently-compiled sliced/one-shot programs
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=1e-12, atol=1e-12)
    assert int(got.step_count) == int(ref.step_count)
    assert int(got.reason) == int(ref.reason)
    assert int(got.n_attempts) == int(ref.n_attempts)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    products, p0 = _problem()
    ref = solve_products(products, p0)

    state = init_solver_state(products, p0)
    state = run_solver(products, state, max_new_attempts=3)
    assert not bool(state.done)

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)
    restored = load_state(path)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state, restored)

    final = run_solver(products, restored)
    got = result_from_state(final)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=1e-12, atol=1e-12)
    assert int(got.n_attempts) == int(ref.n_attempts)


def test_batched_checkpoint(tmp_path):
    products, _ = _problem()
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    p0s = jax.vmap(sp.initial_state)(keys)

    init_b = jax.vmap(lambda q: init_solver_state(products, q))
    run_slice = jax.jit(jax.vmap(
        lambda s: run_solver(products, s, max_new_attempts=2)))
    run_all = jax.jit(jax.vmap(lambda s: run_solver(products, s)))

    state = init_b(p0s)
    state = run_slice(state)
    path = str(tmp_path / "batch.npz")
    save_state(path, state)
    state2 = load_state(path)
    final = run_all(state2)

    ref = jax.vmap(lambda q: solve_products(products, q))(p0s)
    np.testing.assert_allclose(np.asarray(result_from_state(final).p),
                               np.asarray(ref.p), rtol=1e-12, atol=1e-12)


def test_run_on_finished_state_is_noop():
    products, p0 = _problem()
    state = run_solver(products, init_solver_state(products, p0))
    assert bool(state.done)
    again = run_solver(products, state, max_new_attempts=5)
    np.testing.assert_array_equal(np.asarray(again.p), np.asarray(state.p))
    assert int(again.n_attempts) == int(state.n_attempts)


def test_orbax_roundtrip(tmp_path):
    """Orbax wrapper: the multi-host-capable checkpoint path restores the
    exact state."""
    import jax
    import numpy as np
    import pytest
    pytest.importorskip("orbax.checkpoint")
    import libdogleg_tpu.sample_problem as sp
    from libdogleg_tpu import checkpoint, init_solver_state, run_solver

    meas = sp.simulate(jax.random.PRNGKey(0))
    p0 = sp.initial_state(jax.random.PRNGKey(1))
    problem = sp.make_dense_problem(meas)
    st = init_solver_state(problem.products, p0)
    st = run_solver(problem.products, st, max_new_attempts=2)
    path = str(tmp_path / "ckpt")
    checkpoint.save_state_orbax(path, st)
    st2 = checkpoint.load_state_orbax(path, st)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
