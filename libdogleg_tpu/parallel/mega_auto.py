"""Auto-promotion of batched solves into the whole-solve Pallas megakernel.

Round-4's measured headline gap: a user calling the documented API
(``parallel.batched_optimize``) got the XLA while_loop program
(1.0-1.7M solves/s on the benchmark workload), while the megakernel
(ops/pallas_mega.py, 15-17M solves/s) was a bench-side special requiring a
hand-written batch-minor products function. This module closes that gap:
``batched_optimize`` auto-selects the megakernel for the regime it covers
(small dense f32 problems, no history), adapting the user's ORDINARY
per-element products function into the kernel's batch-minor form
automatically:

  * the per-element function is traced once (``jax.make_jaxpr``) and its
    closed-over array constants (sampling grids, design matrices, ...) are
    HOISTED into explicit kernel inputs — Pallas kernels cannot capture
    array constants, which is why the megakernel's raw interface makes the
    caller thread them through ``shared_data``;
  * the traced computation is ``jax.vmap``-ed with the batch on the MINOR
    axis (in_axes=-1/out_axes=-1 — the kernel's lane dimension), consts
    unbatched;
  * whether the resulting program actually lowers through Mosaic is
    decided by an ahead-of-time compile probe: on any failure the caller
    falls back to the XLA path, so auto-selection can never make a
    previously-working call fail.

The adapted kernel is exact-decision identical to the XLA path (same
attempt-for-attempt semantics, tested in tests/test_parallel.py); batches
that don't divide the lane-tile width are padded with copies of element 0
and sliced back.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from libdogleg_tpu.params import DoglegParameters

# The kernel unrolls all linear algebra over Nstate; VMEM residency and
# unroll length cap the state size (ops/pallas_mega.py module docstring).
MEGA_MAX_N = 16
# Auto-selection engages only when the batch is large enough to amortize
# the Mosaic compile (~tens of seconds remote, uncacheable) over real
# throughput win; forced selection (use_megakernel=True) has no floor.
AUTO_MEGA_MIN_BATCH = 1024
# Lane-tile widths to try, best-measured first (BENCH_KERNELS_r04.json).
_BLOCK_CANDIDATES = (512, 256, 128)


# --------------------------------------------------------------------------
# jaxpr re-evaluation with dot_general rewritten to multiply-reduce form.
#
# Mosaic cannot lower the batched dot_generals that jax.vmap makes of the
# user's matmuls (measured on v5e: "failed to parse
# TPU_DotDimensionNumbersAttr parameter 'lhs_non_contracting_dims'"), and
# the handwritten batch-minor products (models/quadratic_surface.py)
# show what it CAN lower: elementwise broadcasts and axis reductions.
# This interpreter replays the user's per-element jaxpr with every
# dot_general expanded into exactly that form — free dimensions unrolled
# (n <= 16 keeps that small), contractions as elementwise mul + sum.
# --------------------------------------------------------------------------

_MAX_UNROLL_FREE = 512  # JtJ at n=16 is 256 entries; beyond this, give up


def _dot_as_mulsum(lhs, rhs, *, dimension_numbers, precision=None,
                   preferred_element_type=None, **_):
    (lc, rc), (lb, rb) = dimension_numbers
    l_free = [i for i in range(lhs.ndim) if i not in lc and i not in lb]
    r_free = [i for i in range(rhs.ndim) if i not in rc and i not in rb]
    lp = jnp.transpose(lhs, list(lb) + l_free + list(lc))
    rp = jnp.transpose(rhs, list(rb) + r_free + list(rc))
    nb, nc = len(lb), len(lc)
    lf = [lhs.shape[i] for i in l_free]
    rf = [rhs.shape[i] for i in r_free]
    import math
    n_out = math.prod(lf) * math.prod(rf)
    if n_out > _MAX_UNROLL_FREE or nb:
        raise NotImplementedError(
            f"dot_general outside the megakernel-adapter regime "
            f"(free={n_out}, batch_dims={nb})")
    # flatten free dims, unroll the (small) output entry grid
    lpf = lp.reshape((-1,) + lp.shape[len(lf):]) if lf else lp[None]
    rpf = rp.reshape((-1,) + rp.shape[len(rf):]) if rf else rp[None]
    acc = preferred_element_type or lhs.dtype
    ents = []
    for i in range(lpf.shape[0]):
        for j in range(rpf.shape[0]):
            prod = (lpf[i] * rpf[j]).astype(acc)
            for _ax in range(nc):
                prod = jnp.sum(prod, axis=-1)
            ents.append(prod)       # scalar per output entry
    out = jnp.stack(ents) if len(ents) > 1 else ents[0][None]
    return out.reshape(tuple(lf) + tuple(rf))


def _eval_rewritten(jaxpr, consts, *args):
    """Evaluate a (first-order) jaxpr with dot_general expanded; inlines
    pjit / custom_jvp / custom_vjp sub-jaxprs so dots inside jnp helpers
    are rewritten too."""
    from jax.extend.core import Literal

    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        prim = eqn.primitive.name
        if prim == "dot_general":
            outvals = [_dot_as_mulsum(*invals, **eqn.params)]
        elif prim == "pjit":
            sub = eqn.params["jaxpr"]
            outvals = _eval_rewritten(sub.jaxpr, sub.consts, *invals)
        elif prim == "custom_jvp_call":
            sub = eqn.params["call_jaxpr"]
            outvals = _eval_rewritten(sub.jaxpr, sub.consts, *invals)
        elif prim in ("custom_vjp_call", "custom_vjp_call_jaxpr"):
            sub = eqn.params.get("fun_jaxpr") or eqn.params.get(
                "call_jaxpr")
            outvals = _eval_rewritten(sub.jaxpr, sub.consts, *invals)
        else:
            outvals = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outvals = [outvals]
        for v, val in zip(eqn.outvars, outvals):
            write(v, val)
    return [read(v) for v in jaxpr.outvars]


def adapt_products_minor(products_fn, p0_elem, data_elem):
    """Adapt a per-element products function to the megakernel's
    batch-minor calling convention.

    Args:
      products_fn: ``p -> Products`` (if data_elem is None) or
        ``(p, data) -> Products``.
      p0_elem: one (Nstate,) example state (concrete or ShapeDtypeStruct).
      data_elem: one problem_data element (pytree), or None.

    Returns (products_minor, shared_consts, n_data_leaves) where
    products_minor(p (n, bt), *data_leaf_tiles (..., bt), *shared_consts)
    -> (norm2 (1, bt), Jt_x (n, bt), JtJ (n, n, bt)).

    Raises TypeError if the traced JtJ is not a dense (n, n) matrix
    (structured JtJ pytrees — Schur, block-sparse — have no megakernel
    path).
    """
    n = p0_elem.shape[-1]
    if data_elem is None:
        data_leaves, data_tree = [], None
    else:
        data_leaves, data_tree = jax.tree_util.tree_flatten(data_elem)
    nd = len(data_leaves)

    def f(p, *dl):
        if data_tree is None:
            pr = products_fn(p)
        else:
            pr = products_fn(
                p, jax.tree_util.tree_unflatten(data_tree, list(dl)))
        jtj = pr.JtJ
        if getattr(jtj, "shape", None) != (n, n):
            raise TypeError(
                f"megakernel needs a dense (n, n) JtJ, got {jtj!r}")
        return pr.norm2_x, pr.Jt_x, jtj

    closed = jax.make_jaxpr(f)(p0_elem, *data_leaves)
    consts = [jnp.asarray(c) for c in closed.consts]
    nc = len(consts)

    def f_explicit(p, *args):
        dl, cs = args[:nd], args[nd:]
        return tuple(_eval_rewritten(closed.jaxpr, list(cs), p, *dl))

    # Double vmap: an OUTER minor-axis map over the lane tile, and an
    # INNER map over a dummy size-1 leading axis. The inner map makes
    # every per-element scalar a (1,) array, so after the outer map
    # scalars are (1, bt) ROWS and vectors (1, m, bt) — the megakernel's
    # known-good Mosaic shape discipline ((bt,) temporaries and
    # replicated-layout scalars are measured lowering faults,
    # ops/pallas_mega.py pitfall list).
    inner = jax.vmap(f_explicit,
                     in_axes=(0,) * (1 + nd) + (None,) * nc, out_axes=0)
    outer = jax.vmap(inner,
                     in_axes=(-1,) * (1 + nd) + (None,) * nc,
                     out_axes=-1)

    def products_minor(p_m, *args):
        dl, cs = args[:nd], args[nd:]
        n2, jtx, jtj = outer(p_m[None], *(d[None] for d in dl), *cs)
        # n2 (1, bt); jtx (1, n, bt); jtj (1, n, n, bt)
        return n2, jtx[0], jtj[0]

    return products_minor, tuple(consts), nd


def _pad_to(a, b_target, axis=0):
    pad = b_target - a.shape[axis]
    if pad == 0:
        return a
    fill = jnp.repeat(jnp.take(a, jnp.asarray([0]), axis=axis), pad,
                      axis=axis)
    return jnp.concatenate([a, fill], axis=axis)


def plan_megakernel(products_fn,
                    p0_batch,
                    parameters: Optional[DoglegParameters],
                    *,
                    problem_data: Any = None,
                    mesh=None,
                    axis_name: str = "dp",
                    forced: bool = False,
                    interpret: Optional[bool] = None):
    """Build a runnable megakernel plan for this batched solve, or return
    None when the regime is outside the kernel's coverage.

    The returned zero-arg callable executes the solve and returns a
    batch-leading SolveResult. It AOT-compiles the kernel first; lowering
    or compile failures raise, which ``batched_optimize`` turns into an
    XLA-path fallback when the selection was automatic.
    """
    from libdogleg_tpu.ops.pallas_mega import megakernel_optimize

    leaves = jax.tree_util.tree_leaves(p0_batch)
    if len(leaves) != 1 or leaves[0].ndim != 2:
        return None
    p0 = leaves[0]
    B, n = p0.shape
    if n > MEGA_MAX_N:
        return None
    if p0.dtype != jnp.float32 and not forced:
        # f64 megakernels only exist in interpret mode (tests); Mosaic
        # compiles would fail on TPU, so auto never selects them
        return None
    if not forced and B < AUTO_MEGA_MIN_BATCH:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not forced and interpret:
        # interpret mode is a correctness vehicle, not a fast path
        return None

    # lane-tile width and padding
    n_shards = 1
    if mesh is not None:
        n_shards = int(mesh.devices.size)
        if B % n_shards:
            return None  # don't pad across shard boundaries
    per_shard = B // n_shards
    block = next((b for b in _BLOCK_CANDIDATES if per_shard % b == 0),
                 None)
    padded_B = B
    if block is None:
        if mesh is not None:
            return None
        block = min(_BLOCK_CANDIDATES[0],
                    max(128, 1 << (max(per_shard, 1) - 1).bit_length()))
        padded_B = -(-B // block) * block

    p0_elem = jax.tree_util.tree_map(lambda a: a[0], p0_batch)
    data_elem = (None if problem_data is None else
                 jax.tree_util.tree_map(lambda a: a[0], problem_data))
    try:
        products_minor, shared, nd = adapt_products_minor(
            products_fn, p0_elem, data_elem)
    except Exception:
        if forced:
            raise
        return None

    data_leaves = ([] if problem_data is None
                   else jax.tree_util.tree_leaves(problem_data))
    prm = parameters if parameters is not None else DoglegParameters()

    def run():
        p0_in = _pad_to(p0, padded_B)
        data_in = tuple(_pad_to(d, padded_B) for d in data_leaves)

        def solve(q, *dl):
            return megakernel_optimize(
                products_minor, q, prm, problem_data=dl,
                shared_data=shared, block_batch=block, mesh=mesh,
                axis_name=axis_name, interpret=interpret)

        jitted = jax.jit(solve)
        # AOT compile: surfaces Mosaic lowering/compile failures HERE,
        # where the caller can still fall back to the XLA path, instead
        # of asynchronously at the first fetch.
        compiled = jitted.lower(p0_in, *data_in).compile()
        res = compiled(p0_in, *data_in)
        if padded_B != B:
            res = jax.tree_util.tree_map(lambda a: a[:B], res)
        return res

    return run


def _env_disabled() -> bool:
    return os.environ.get("LIBDOGLEG_TPU_NO_MEGAKERNEL", "") not in ("", "0")
