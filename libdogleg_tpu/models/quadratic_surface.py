"""The reference's demo/integration-test problem, re-specified in JAX.

Spec (not code) from reference sample.c: fit the 6-parameter model

    m(x, y; p) = p0*p1*x^2 + p1*p2*y^2 + p2*x*y + p3*x + p4*y + p5

to 100 noise-corrupted measurements sampled on a 10x10 grid with
x, y in {-10, -8, ..., 8} (sample.c:35-39, 64-80), true parameters
(1, 2, 3, 4, 5, 6) (sample.c:28-33), +-0.5 units of uniform noise
(sample.c:60), and an initial state drawn uniformly from [-0.1, 0.9]
(sample.c:371). The reference asserts convergence within 8 accepted steps and
per-parameter recovery within 5e-2 (sample.c:365, 443-457); our integration
tests and benchmarks assert the same budget.

The C reference seeds glibc random(); exact noise streams are not
reproducible (nor meaningful) here — jax.random with a fixed key gives the
same determinism guarantee.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from libdogleg_tpu.problems import (DenseProblem, ProductsProblem,
                                    ResidualProblem, SparseProblem)
from libdogleg_tpu.sparsity import dense_structure

NSTATE = 6
GRID_WIDTH = 10
GRID_MIN = -10.0
GRID_DELTA = 2.0
NMEAS = GRID_WIDTH * GRID_WIDTH
P_TRUE = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])


def make_grid(dtype=jnp.float64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The 10x10 sampling grid (reference sample.c:64-80; x-major order)."""
    coords = GRID_MIN + GRID_DELTA * np.arange(GRID_WIDTH)
    gx, gy = np.meshgrid(coords, coords, indexing="ij")
    return (jnp.asarray(gx.ravel(), dtype), jnp.asarray(gy.ravel(), dtype))


def model(p: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    return (p[0] * p[1] * gx * gx
            + p[1] * p[2] * gy * gy
            + p[2] * gx * gy
            + p[3] * gx
            + p[4] * gy
            + p[5])


def jacobian(p: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (nmeas, 6) Jacobian (reference sample.c:118-123)."""
    one = jnp.ones_like(gx)
    return jnp.stack([
        p[1] * gx * gx,
        p[0] * gx * gx + p[2] * gy * gy,
        p[1] * gy * gy + gx * gy,
        gx,
        gy,
        one,
    ], axis=-1)


def simulate(key: jax.Array, dtype=jnp.float64,
             noise: float = 1.0) -> jnp.ndarray:
    """Noisy measurements: truth +- 0.5*noise units uniform (sample.c:46-62)."""
    gx, gy = make_grid(dtype)
    truth = model(jnp.asarray(P_TRUE, dtype), gx, gy)
    u = jax.random.uniform(key, (NMEAS,), dtype=dtype)
    return truth + (u - 0.5) * noise


def initial_state(key: jax.Array, dtype=jnp.float64) -> jnp.ndarray:
    """Initial guess uniform in [-0.1, 0.9] (sample.c:371)."""
    u = jax.random.uniform(key, (NSTATE,), dtype=dtype)
    return u - 0.1


def residuals(p: jnp.ndarray, measurements: jnp.ndarray,
              gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    return model(p, gx, gy) - measurements


def make_dense_problem(measurements: jnp.ndarray) -> DenseProblem:
    """Dense mode (reference optimizerCallback_dense, sample.c:130-162)."""
    dtype = measurements.dtype
    gx, gy = make_grid(dtype)

    def f(p):
        return residuals(p, measurements, gx, gy), jacobian(p, gx, gy)
    return DenseProblem(f=f)


def make_sparse_problem(measurements: jnp.ndarray,
                        block_rows: int = 4) -> SparseProblem:
    """Sparse mode. The demo problem is fully dense (sample.c:113-116), so
    the block pattern stores every block — exercising the BCSR machinery the
    way sample.c exercises the CHOLMOD path with a dense pattern."""
    dtype = measurements.dtype
    gx, gy = make_grid(dtype)
    structure = dense_structure(NMEAS, NSTATE,
                                block_rows=block_rows, block_cols=NSTATE)

    def f(p):
        x = residuals(p, measurements, gx, gy)
        J = jacobian(p, gx, gy)
        values = J.reshape(structure.nbrow, block_rows, 1, NSTATE)
        values = values.reshape(structure.nnzb, block_rows, NSTATE)
        return x, values
    return SparseProblem(f=f, structure=structure)


def make_products_problem(measurements: jnp.ndarray) -> ProductsProblem:
    """Products mode (reference optimizerCallback_dense_products,
    sample.c:165-237): the user reduces over measurements themselves."""
    dtype = measurements.dtype
    gx, gy = make_grid(dtype)

    def f(p):
        x = residuals(p, measurements, gx, gy)
        J = jacobian(p, gx, gy)
        return (jnp.dot(x, x),
                jnp.matmul(J.T, x, preferred_element_type=dtype),
                jnp.matmul(J.T, J, preferred_element_type=dtype))
    return ProductsProblem(f=f)


def make_residual_problem(measurements: jnp.ndarray) -> ResidualProblem:
    """Autodiff mode (no reference equivalent)."""
    dtype = measurements.dtype
    gx, gy = make_grid(dtype)
    return ResidualProblem(f=lambda p: residuals(p, measurements, gx, gy))
