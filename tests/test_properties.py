"""Property-based invariants of the step math (hypothesis).

The reference's correctness rests on a handful of geometric invariants it
never states as tests (SURVEY.md section 4 notes the absence of
per-function unit tests); these pin them over randomized inputs:

  * the Cauchy step is a descent direction of the quadratic model;
  * the selected dog-leg step never exceeds the trust region (except the
    interior full-GN case, which is strictly inside by construction);
  * the interpolated step lands exactly ON the trust-region sphere;
  * the trust-region update only ever shrinks on a bad gain ratio and
    only grows at the region edge.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from libdogleg_tpu.ops import dense as dops

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def _problem(seed, n, m):
    rng = np.random.default_rng(seed)
    J = rng.normal(size=(m, n))
    x = rng.normal(size=(m,))
    JtJ = J.T @ J + 1e-6 * np.eye(n)
    Jt_x = J.T @ x
    return jnp.asarray(JtJ), jnp.asarray(Jt_x)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(2, 10))
def test_cauchy_is_descent(seed, n):
    JtJ, Jt_x = _problem(seed, n, n + 6)
    c = dops.cauchy_step(Jt_x, JtJ)
    # model decrease of the Cauchy step is positive (it minimizes the
    # quadratic along -gradient)
    dec = dops.expected_improvement(Jt_x, JtJ, c.step)
    assert float(dec) >= -1e-9
    assert float(jnp.dot(Jt_x, c.step)) <= 1e-12


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(2, 8),
       log_tr=st.floats(-3.0, 2.0))
def test_interpolated_step_on_sphere(seed, n, log_tr):
    JtJ, Jt_x = _problem(seed, n, n + 4)
    tr = float(10.0 ** log_tr)
    c = dops.cauchy_step(Jt_x, JtJ)
    from libdogleg_tpu.ops.cholesky import factorize_jtj, gauss_newton_step
    fac = factorize_jtj(JtJ, jnp.asarray(0.0))
    gn, n2_gn = gauss_newton_step(fac.L, Jt_x)
    n2_c = float(c.norm2_step)
    # only the dog-leg case: cauchy strictly inside, GN strictly outside
    if not (n2_c < tr * tr < float(n2_gn)):
        return
    interp = dops.interpolated_step(c.step, c.norm2_step, gn, jnp.asarray(tr))
    np.testing.assert_allclose(float(jnp.sqrt(interp.norm2_step)), tr,
                               rtol=1e-8)
    assert 0.0 <= float(interp.k) <= 1.0 + 1e-12


@settings(max_examples=80, deadline=None)
@given(rho=st.floats(-5.0, 5.0, allow_nan=False),
       tr=st.floats(1e-6, 1e3),
       edge=st.booleans(),
       n2gn=st.floats(1e-12, 1e6))
def test_trust_region_update_rules(rho, tr, edge, n2gn):
    out = float(dops.trust_region_update(
        jnp.asarray(rho), jnp.asarray(tr), jnp.asarray(edge),
        jnp.asarray(n2gn),
        decrease_factor=0.1, decrease_threshold=0.25,
        increase_factor=2.0, increase_threshold=0.75))
    if rho < 0.25:
        # shrink path; interior steps snap to the GN length first
        base = tr if edge else float(np.sqrt(n2gn))
        np.testing.assert_allclose(out, base * 0.1, rtol=1e-12)
    elif rho > 0.75 and edge:
        np.testing.assert_allclose(out, tr * 2.0, rtol=1e-12)
    else:
        np.testing.assert_allclose(out, tr, rtol=1e-12)


@settings(max_examples=40, deadline=None)
@given(rho_nan=st.just(float("nan")), tr=st.floats(1e-3, 1e3),
       edge=st.booleans())
def test_trust_region_nan_rho_keeps_radius(rho_nan, tr, edge):
    """NaN gain ratio fails every comparison and leaves the radius alone
    (C comparison semantics, reference dogleg.c:1324-1354)."""
    out = float(dops.trust_region_update(
        jnp.asarray(rho_nan), jnp.asarray(tr), jnp.asarray(edge),
        jnp.asarray(1.0),
        decrease_factor=0.1, decrease_threshold=0.25,
        increase_factor=2.0, increase_threshold=0.75))
    assert out == tr
