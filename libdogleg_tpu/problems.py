"""Problem adapters: the library/user boundary.

The reference defines three callback flavors (reference dogleg.h:11-45):
sparse (x + CSR Jt), dense (x + row-major J), and dense-products
(norm2x, Jt_x, JtJ — for Nstate << Nmeasurements, so x and J never
materialize, reference dogleg.c:1054-1069). Each maps to an adapter class
here; all of them reduce an operating point to the solver's universal
`Products`. A fourth adapter, ResidualProblem, accepts a residual-only
function and derives the Jacobian by autodiff — something a C library cannot
offer.

User functions must be pure and jit-compatible (traced once); any extra data
(the reference's `cookie`, dogleg.h:20) is closed over or passed via
functools.partial.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from libdogleg_tpu.ops import bcsr as bops
from libdogleg_tpu.ops import dense as dops
from libdogleg_tpu.ops.bcsr import BCSRJacobian, BCSRStructure
from libdogleg_tpu.params import DoglegParameters
from libdogleg_tpu.solver import Products, SolveResult, solve_products


@dataclasses.dataclass(frozen=True)
class DenseProblem:
    """Dense formulation: f(p) -> (x, J) with J of shape (nmeas, nstate)
    (reference dogleg_callback_dense_t, dogleg.h:21-30)."""
    f: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]

    def products(self, p: jnp.ndarray) -> Products:
        x, J = self.f(p)
        return Products(norm2_x=dops.norm2(x),
                        Jt_x=dops.jt_dot(J, x),
                        JtJ=dops.build_jtj(J))

    def full(self, p: jnp.ndarray):
        """(x, J) for analysis paths (gradient check, outlierness)."""
        return self.f(p)

    def dense_jacobian(self, p: jnp.ndarray) -> jnp.ndarray:
        return self.f(p)[1]


@dataclasses.dataclass(frozen=True)
class SparseProblem:
    """Block-sparse formulation: f(p) -> (x, values) where values is the
    (nnzb, bm, bn) block-value tensor for the fixed `structure`
    (reference dogleg_callback_t, dogleg.h:11-20, with the static BCSR
    structure playing the role of the one-time symbolic analysis).

    jtj selects the Gauss-Newton system representation:
      "dense"  (default): JtJ materializes as (nstate, nstate) — right while
        nstate is moderate (one dense Cholesky on the MXU beats any sparse
        schedule there).
      "sparse": JtJ stays block-sparse on its symbolic lower-triangle
        pattern and the Newton step runs through the level-scheduled
        block-sparse Cholesky (the CHOLMOD regime, for large nstate).
        `ordering` is the fill-reducing ordering passed to the analysis.
    Pass `default_newton_solver()` to the solver (optimize() does this
    automatically when no newton_solver is given)."""
    f: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
    structure: BCSRStructure
    jtj: str = "dense"
    # None picks the right companion: "mindeg" simplicial, "rcm" amalgamated
    ordering: object = None
    amalgamate: int = 1
    _jtj_sched: object = dataclasses.field(init=False, default=None,
                                           repr=False, compare=False)
    _newton: object = dataclasses.field(init=False, default=None,
                                        repr=False, compare=False)

    def __post_init__(self):
        if self.jtj not in ("dense", "sparse"):
            raise ValueError(f"jtj must be 'dense' or 'sparse', "
                             f"got {self.jtj!r}")
        if self.jtj == "sparse":
            from libdogleg_tpu.ops.newton import SparseNewtonSolver
            s = self.structure
            if s.block_rows > 1 and s.nmeas % s.block_rows:
                raise ValueError("nmeas must divide into block rows")
            sched = bops.jtj_lower_schedule(s)
            ns = SparseNewtonSolver.analyze(
                sched.rows, sched.cols, s.nbcol, s.block_cols,
                self.ordering, amalgamate=self.amalgamate)
            object.__setattr__(self, "_jtj_sched", sched)
            object.__setattr__(self, "_newton", ns)

    def jacobian(self, p: jnp.ndarray) -> Tuple[jnp.ndarray, BCSRJacobian]:
        x, values = self.f(p)
        return x, BCSRJacobian(structure=self.structure, values=values)

    def products(self, p: jnp.ndarray) -> Products:
        x, J = self.jacobian(p)
        if self.jtj == "sparse":
            JtJ = bops.bcsr_jtj_lower_blocks(J, self._jtj_sched)
        else:
            JtJ = bops.bcsr_jtj_dense(J)
        return Products(norm2_x=dops.norm2(x),
                        Jt_x=bops.bcsr_jt_x(J, x),
                        JtJ=JtJ)

    def default_newton_solver(self):
        return self._newton  # None for "dense" -> solver default

    def full(self, p: jnp.ndarray):
        x, J = self.jacobian(p)
        return x, bops.bcsr_to_dense(J)

    def dense_jacobian(self, p: jnp.ndarray) -> jnp.ndarray:
        return self.full(p)[1]


@dataclasses.dataclass(frozen=True)
class ProductsProblem:
    """Products formulation: f(p) -> (norm2x, Jt_x, JtJ) with JtJ full
    symmetric (reference dogleg_callback_dense_products_t, dogleg.h:34-45).
    Packed-triangle callbacks can be adapted with
    libdogleg_tpu.utils.packed.packed_to_full."""
    f: Callable[[jnp.ndarray],
                Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]

    def products(self, p: jnp.ndarray) -> Products:
        norm2x, Jt_x, JtJ = self.f(p)
        return Products(norm2_x=norm2x, Jt_x=Jt_x, JtJ=JtJ)


@dataclasses.dataclass(frozen=True)
class ResidualProblem:
    """Residual-only formulation: f(p) -> x; the Jacobian comes from autodiff
    (jacfwd — nmeas >= nstate makes forward mode the right default). No
    reference equivalent: the C library requires hand-written Jacobians and
    ships a checker for them (dogleg.c:349-522); autodiff makes both
    unnecessary."""
    f: Callable[[jnp.ndarray], jnp.ndarray]

    def products(self, p: jnp.ndarray) -> Products:
        x, J = self.full(p)
        return Products(norm2_x=dops.norm2(x),
                        Jt_x=dops.jt_dot(J, x),
                        JtJ=dops.build_jtj(J))

    def full(self, p: jnp.ndarray):
        return self.f(p), jax.jacfwd(self.f)(p)

    def dense_jacobian(self, p: jnp.ndarray) -> jnp.ndarray:
        return jax.jacfwd(self.f)(p)


def optimize(problem,
             p0: jnp.ndarray,
             parameters: Optional[DoglegParameters] = None,
             *,
             newton_solver=None,
             record_history: bool = False,
             history_capacity: Optional[int] = None,
             debug: bool = False) -> SolveResult:
    """Top-level solve — the counterpart of dogleg_optimize2 /
    dogleg_optimize_dense2 / dogleg_optimize_dense_products (reference
    dogleg.c:1755-1818), with the solve-type dispatch replaced by the problem
    adapter's `products` method. Returns the full SolveResult (the reference
    returns norm2(x) and optionally the solver context, dogleg.c:1694-1752).

    jit/vmap-compatible: wrap in jax.jit for production use; vmap over p0
    (and over closed-over problem data via the adapters' pytree fields) for
    batched solves.
    """
    if newton_solver is None:
        default = getattr(problem, "default_newton_solver", None)
        if default is not None:
            newton_solver = default()
    return solve_products(problem.products, p0, parameters,
                          newton_solver=newton_solver,
                          record_history=record_history,
                          history_capacity=history_capacity,
                          debug=debug)
