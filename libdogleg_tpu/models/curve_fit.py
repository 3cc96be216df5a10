"""Exponential-decay curve fit: a small dense-Jacobian model family.

The canonical "dense path" workload (BASELINE.md config 2; the reference's
dense entry points dogleg_optimize_dense/dense2, reference dogleg.c:1767-1790,
exercised there only through sample.c's dense callback): fit

    m(t; p) = p0 * exp(p1 * t) + p2

to nmeas samples on t in [0, 1]. Nstate = 3 with a closed-form Jacobian, so
the problem is a pure test of the trust-region driver + dense Cholesky; it is
genuinely nonlinear (the reference's quadratic-surface demo is linear in p,
converging in one GN step from anywhere — this one is not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libdogleg_tpu.problems import (DenseProblem, ProductsProblem,
                                    ResidualProblem)

NSTATE = 3
P_TRUE = np.array([2.0, -1.5, 0.5])


def make_t(nmeas: int = 64, dtype=jnp.float64) -> jnp.ndarray:
    return jnp.linspace(0.0, 1.0, nmeas, dtype=dtype)


def model(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return p[0] * jnp.exp(p[1] * t) + p[2]


def jacobian(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    e = jnp.exp(p[1] * t)
    return jnp.stack([e, p[0] * t * e, jnp.ones_like(t)], axis=-1)


def simulate(key: jax.Array, nmeas: int = 64, dtype=jnp.float64,
             noise: float = 0.02) -> jnp.ndarray:
    t = make_t(nmeas, dtype)
    truth = model(jnp.asarray(P_TRUE, dtype), t)
    return truth + noise * jax.random.normal(key, (nmeas,), dtype=dtype)


def initial_state(key: jax.Array, dtype=jnp.float64) -> jnp.ndarray:
    """A spread-out initial guess ([0, 1)-uniform around zero) that forces
    several trust-region iterations."""
    return jax.random.uniform(key, (NSTATE,), dtype=dtype) - 0.5


def residuals(p, measurements, t):
    return model(p, t) - measurements


def make_dense_problem(measurements: jnp.ndarray) -> DenseProblem:
    t = make_t(measurements.shape[0], measurements.dtype)

    def f(p):
        return residuals(p, measurements, t), jacobian(p, t)
    return DenseProblem(f=f)


def make_products_problem(measurements: jnp.ndarray) -> ProductsProblem:
    t = make_t(measurements.shape[0], measurements.dtype)
    dtype = measurements.dtype

    def f(p):
        x = residuals(p, measurements, t)
        J = jacobian(p, t)
        return (jnp.dot(x, x),
                jnp.matmul(J.T, x, preferred_element_type=dtype),
                jnp.matmul(J.T, J, preferred_element_type=dtype))
    return ProductsProblem(f=f)


def make_residual_problem(measurements: jnp.ndarray) -> ResidualProblem:
    t = make_t(measurements.shape[0], measurements.dtype)
    return ResidualProblem(f=lambda p: residuals(p, measurements, t))
