"""Parameter-system parity: defaults and semantics pinned to the reference
(the analog of the reference's ABI regression test, test-misc.c — here what
must never drift silently is the default *values* and knob set,
dogleg.c:117-128)."""

from libdogleg_tpu import DoglegParameters, get_default_parameters


def test_defaults_match_reference_exactly():
    p = get_default_parameters()
    assert p.max_iterations == 100                      # dogleg.c:119
    assert p.trustregion0 == 1.0e3                      # dogleg.c:120
    assert p.trustregion_decrease_factor == 0.1         # dogleg.c:121
    assert p.trustregion_decrease_threshold == 0.25     # dogleg.c:122
    assert p.trustregion_increase_factor == 2.0         # dogleg.c:123
    assert p.trustregion_increase_threshold == 0.75     # dogleg.c:124
    assert p.Jt_x_threshold == 1e-8                     # dogleg.c:125
    assert p.update_threshold == 1e-8                   # dogleg.c:126
    assert p.trustregion_threshold == 1e-8              # dogleg.c:127
    assert p.lambda_initial == 1e-10                    # dogleg.c:138


def test_parameters_are_immutable_and_replaceable():
    p = DoglegParameters()
    q = p.replace(max_iterations=8)
    assert q.max_iterations == 8 and p.max_iterations == 100
    try:
        p.max_iterations = 5
        assert False, "should be frozen"
    except AttributeError:
        pass


def test_attempt_cap_derivation():
    assert DoglegParameters().resolved_max_attempts() == 100 * 64
    assert DoglegParameters(max_attempts=7).resolved_max_attempts() == 7


def test_legacy_global_setters():
    """The legacy compat layer mirrors the reference's dogleg_set* surface
    (dogleg.c:131-181) onto a module-global default parameter set."""
    import importlib
    import jax
    import jax.numpy as jnp
    import numpy as np
    from libdogleg_tpu import legacy
    import libdogleg_tpu.sample_problem as sp

    importlib.reload(legacy)
    try:
        legacy.set_max_iterations(8)
        legacy.set_initial_trustregion(500.0)
        legacy.set_thresholds(-1.0, 1e-9, -1.0)     # <=0 leaves unchanged
        legacy.set_trustregion_update_parameters(0.2, 0.3, 3.0, 0.8)
        prm = legacy.get_global_parameters()
        assert prm.max_iterations == 8
        assert prm.trustregion0 == 500.0
        assert prm.Jt_x_threshold == 1e-8            # unchanged
        assert prm.update_threshold == 1e-9
        assert prm.trustregion_decrease_factor == 0.2
        assert prm.trustregion_increase_factor == 3.0

        legacy.set_debug(legacy.DOGLEG_DEBUG_VNLOG)
        meas = sp.simulate(jax.random.PRNGKey(0))
        p0 = sp.initial_state(jax.random.PRNGKey(1))
        r = legacy.optimize(sp.make_dense_problem(meas), p0)
        assert r.history is not None                 # vnlog bit -> history
        assert int(r.step_count) <= 8
        err = np.max(np.abs(np.asarray(r.p) - np.asarray(sp.P_TRUE)))
        assert err < 5e-2
    finally:
        importlib.reload(legacy)                     # reset globals for others
