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

from libdogleg_tpu.problems import (DenseProblem, FactoredBasisProblem,
                                    ProductsProblem,
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


def products_minor(p: jnp.ndarray, meas: jnp.ndarray,
                   X: jnp.ndarray, Y: jnp.ndarray):
    """Batch-MINOR products for ops.pallas_mega.megakernel_optimize:
    p (6, bt), meas (nmeas, bt), X/Y (nmeas, 1) grid columns (pass via
    shared_data — Pallas kernels cannot capture array constants) ->
    (norm2 (1, bt), Jt_x (6, bt), JtJ (6, 6, bt)). Same math as
    model()/jacobian() with the batch in the lane dimension; built from
    broadcasts only, traceable inside a Pallas kernel."""
    x = (p[0:1] * p[1:2] * X * X + p[1:2] * p[2:3] * Y * Y
         + p[2:3] * X * Y + p[3:4] * X + p[4:5] * Y + p[5:6]
         - meas)              # (m, bt)
    ones = jnp.ones_like(x[:, :1] * p[0:1])  # (m, bt) of ones
    J = [p[1:2] * X * X,
         p[0:1] * X * X + p[2:3] * Y * Y,
         p[1:2] * Y * Y + X * Y,
         X * ones, Y * ones, ones]           # 6 x (m, bt)
    norm2 = jnp.sum(x * x, axis=0, keepdims=True)
    jtx = jnp.concatenate(
        [jnp.sum(Jk * x, axis=0, keepdims=True) for Jk in J], axis=0)
    rows = []
    for a in range(6):
        rows.append(jnp.concatenate(
            [jnp.sum(J[a] * J[b], axis=0, keepdims=True)
             for b in range(6)], axis=0))
    jtj = jnp.stack(rows, axis=0)            # (6, 6, bt)
    return norm2, jtx, jtj


def factored_products_minor(p, h_hi, h_lo, n2m_hi, n2m_lo, Ghi, Glo):
    """Batch-MINOR factored (sufficient-statistics) products for
    ops.pallas_mega.megakernel_optimize — config 3f inside the kernel.

    Args (bt = lane-tile width):
      p (6, bt); per-element tiles h_hi/h_lo (6, bt) and n2m_hi/n2m_lo
      (1, bt) from factored_statistics (pass n2m components reshaped to
      (B, 1)); shared Ghi/Glo (6, 6) from gram_pair.

    The cancelling combinations (G c - h, m.m - c.h) run in compensated
    double-f32 exactly like FactoredBasisProblem.products, with the
    pairwise reduction replaced by a sequential two_sum cascade (same
    O(eps^2) error class, kernel-friendly unrolled form). T's structure
    is hand-applied (8 nonzero entries), so JtJ/Jt_x assembly is ~40
    elementwise ops instead of two 6x6 matmuls per lane."""
    from libdogleg_tpu.ops.compensated import two_prod, two_sum

    # coefficients c = [p0 p1, p1 p2, p2, p3, p4, p5]   (6, bt)
    c = [p[0:1] * p[1:2], p[1:2] * p[2:3], p[2:3],
         p[3:4], p[4:5], p[5:6]]

    # (G c) as compensated pairs, row by row (Ghi/Glo entries are (1,1))
    gh, gl = [], []
    for i in range(6):
        s, lo = two_prod(Ghi[i:i + 1, 0:1], c[0])
        lo = lo + Glo[i:i + 1, 0:1] * c[0]
        for j in range(1, 6):
            pj, pe = two_prod(Ghi[i:i + 1, j:j + 1], c[j])
            s, se = two_sum(s, pj)
            lo = lo + pe + se + Glo[i:i + 1, j:j + 1] * c[j]
        gh.append(s)
        gl.append(lo)

    # g = (G c - h) collapsed; the pair keeps the cancellation exact
    g = []
    for i in range(6):
        s, e = two_sum(gh[i], -h_hi[i:i + 1])
        g.append(s + (gl[i] - h_lo[i:i + 1] + e))

    # Jt_x = T^T g with T's sparsity hand-applied
    jtx = jnp.concatenate([
        p[1:2] * g[0],
        p[0:1] * g[0] + p[2:3] * g[1],
        p[1:2] * g[1] + g[2],
        g[3], g[4], g[5]], axis=0)

    # JtJ = T^T (Ghi + Glo) T: M = G T column-wise, then rows of T^T M
    Gf = Ghi + Glo                      # (6, 6) shared, collapsed
    M = []                              # 6 columns, each (6, bt)
    col_g = lambda j: Gf[:, j:j + 1]    # (6, 1)
    M.append(col_g(0) * p[1:2])
    M.append(col_g(0) * p[0:1] + col_g(1) * p[2:3])
    M.append(col_g(1) * p[1:2] + col_g(2))
    ones = jnp.ones_like(p[0:1])
    for j in (3, 4, 5):
        M.append(col_g(j) * ones)
    Mm = jnp.stack(M, axis=1)           # (6, 6, bt): Mm[i, b]
    jtj = jnp.stack([
        p[1:2] * Mm[0],
        p[0:1] * Mm[0] + p[2:3] * Mm[1],
        p[1:2] * Mm[1] + Mm[2],
        Mm[3], Mm[4], Mm[5]], axis=0)   # (6, 6, bt)

    # norm2 = c.g + ((m.m) - c.h), the second term compensated
    cg = sum(c[i] * g[i] for i in range(6))
    wh, wl = two_prod(c[0], h_hi[0:1])
    wl = wl + c[0] * h_lo[0:1]
    for i in range(1, 6):
        pi, pe = two_prod(c[i], h_hi[i:i + 1])
        wh, se = two_sum(wh, pi)
        wl = wl + pe + se + c[i] * h_lo[i:i + 1]
    uh, ue = two_sum(n2m_hi, -wh)
    norm2 = cg + (uh + (n2m_lo - wl + ue))
    norm2 = jnp.maximum(norm2, jnp.zeros_like(norm2))
    return norm2, jtx, jtj


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


# ---------------------------------------------------------------------------
# Basis-factored sufficient-statistics formulation.
#
# The sample model is linear in a STATIC basis: model(p) = B @ coeffs(p)
# with B = [x^2, y^2, xy, x, y, 1] fixed by the grid, so
#     J          = B @ T(p),            T = d coeffs / dp  (6x6)
#     JtJ        = T^T (B^T B) T        (B^T B = G precomputed once)
#     Jt_x       = T^T (G c - B^T meas) (B^T meas = h precomputed per
#                                        instance)
#     norm2_x    = c.(G c - h) + (meas.meas - c.h)
# The per-attempt evaluation therefore reads 14 f32 of sufficient
# statistics instead of streaming all m measurements, and does O(n^2)
# flops instead of O(m n^2) — the difference between an HBM-bound and a
# carry-bound batched solve (see bench_kernels end_to_end rows). The
# reference's callback model cannot express this (the callback always
# walks the measurement vector, sample.c:130-237); it is a TPU-first
# reformulation of the same mathematics.
#
# Numerics: G c and h carry ~1e7 magnitudes whose difference is the
# O(1e-3..1) gradient — plain f32 would cancel to noise. G, h and
# meas.meas are therefore held as double-f32 PAIRS and the cancelling
# combinations run in compensated arithmetic (ops/compensated.py), making
# the factored gradient MORE accurate than the general form's f32
# per-measurement reduction. coeffs(p) is used at its stored-f32 value,
# exactly as the general form rounds the same products.
# ---------------------------------------------------------------------------

def basis(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """The static (nmeas, 6) basis: model(p) = basis @ coeffs(p). Entries
    are integers <= 100 on the sample grid — exact in f32."""
    return jnp.stack([gx * gx, gy * gy, gx * gy, gx, gy,
                      jnp.ones_like(gx)], axis=-1)


def coeffs(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([p[0] * p[1], p[1] * p[2], p[2], p[3], p[4], p[5]])


def coeffs_jac(p: jnp.ndarray) -> jnp.ndarray:
    """T[i, j] = d coeffs_i / d p_j."""
    one = jnp.ones((), p.dtype)
    T = jnp.zeros((NSTATE, NSTATE), p.dtype)
    T = T.at[0, 0].set(p[1]).at[0, 1].set(p[0])
    T = T.at[1, 1].set(p[2]).at[1, 2].set(p[1])
    T = T.at[2, 2].set(one).at[3, 3].set(one)
    T = T.at[4, 4].set(one).at[5, 5].set(one)
    return T


def factored_statistics(measurements: jnp.ndarray):
    """Per-instance sufficient statistics as double-f32 pairs:
    (h_hi, h_lo) = B^T meas and (n2m_hi, n2m_lo) = meas . meas."""
    gx, gy = make_grid(measurements.dtype)
    return FactoredBasisProblem.statistics(basis(gx, gy), measurements)


def gram_pair(dtype=jnp.float32):
    """G = B^T B as a double-f32 pair (exact integer entries up to ~1e10
    exceed f32's 24-bit integer range; computed in f64 numpy, split)."""
    coords = GRID_MIN + GRID_DELTA * np.arange(GRID_WIDTH)
    gx, gy = np.meshgrid(coords, coords, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    B = np.stack([gx * gx, gy * gy, gx * gy, gx, gy,
                  np.ones_like(gx)], axis=-1)
    return FactoredBasisProblem.gram(B, dtype)


def factored_products(p: jnp.ndarray, stats, G_pair):
    """Products from sufficient statistics (see module comment above).
    stats = factored_statistics(meas); G_pair = gram_pair(dtype)."""
    return FactoredBasisProblem(coeffs=coeffs, G_pair=G_pair,
                                stats=stats,
                                coeffs_jac=coeffs_jac).products(p)


def make_factored_problem(measurements: jnp.ndarray) -> FactoredBasisProblem:
    """The sufficient-statistics formulation as a drop-in problem: same
    optimum as make_dense_problem / make_products_problem, per-attempt
    cost independent of the measurement count."""
    return FactoredBasisProblem(
        coeffs=coeffs,
        G_pair=gram_pair(measurements.dtype),
        stats=factored_statistics(measurements),
        coeffs_jac=coeffs_jac)


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
