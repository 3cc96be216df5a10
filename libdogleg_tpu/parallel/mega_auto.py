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

# Elementwise primitives the minor-batching interpreter passes straight
# through (per-element broadcasting semantics are preserved by the
# trailing-lane convention; see _MinorBatch).
_ELEMENTWISE = frozenset({
    "add", "sub", "mul", "div", "rem", "pow", "atan2", "max", "min",
    "and", "or", "xor", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "nextafter",
    "neg", "sign", "floor", "ceil", "round", "abs", "sqrt", "rsqrt",
    "cbrt", "exp", "exp2", "expm1", "log", "log1p", "logistic", "tanh",
    "tan", "sin", "cos", "asin", "acos", "atan", "sinh", "cosh",
    "asinh", "acosh", "atanh", "erf", "erfc", "erf_inv", "is_finite",
    "not", "integer_pow", "square", "reciprocal",
    "eq", "ne", "lt", "le", "gt", "ge", "select_n",
    "convert_element_type", "stop_gradient", "copy", "clamp",
})

_REDUCES = frozenset({"reduce_sum", "reduce_max", "reduce_min",
                      "reduce_prod", "reduce_and", "reduce_or"})


class _MinorBatch:
    """Evaluate a per-element jaxpr with the batch on a TRAILING lane
    axis, emitting only Mosaic-provenly-lowerable op forms.

    Why not jax.vmap: its batching rules are free to move the batch
    dimension to the FRONT internally (concatenate/stack of two or more
    batched operands measurably does), producing batch-leading
    intermediates and transposes whose Mosaic lowering faults with an
    opaque tpu_compile_helper crash (bisected on v5e, round 5); its
    dot_general rule emits batched TPU_DotDimensionNumbers Mosaic cannot
    parse at all. This interpreter IS a vmap, with three rules changed:

      * every batched value keeps the lane axis LAST, always — the
        measured-good discipline of the handwritten batch-minor products
        (models/quadratic_surface.py) and of ops/pallas_mega.py itself;
      * dot_general is expanded: free dims transposed to the FRONT
        (batched 3-D transposes lower fine; middle-axis slicing does
        not), unrolled entry-by-entry (n <= 16 keeps that small),
        contractions as elementwise mul + leading-axis sums;
      * unbatched operands meet batched ones by a trailing unit lane
        axis, never by materialized broadcast.

    Values are (array, batched) pairs; unbatched values flow through
    at their per-element shape until an op mixes them with the lane.
    """

    def __init__(self, bt_name="bt"):
        self.env = {}

    # -- value plumbing ----------------------------------------------------

    @staticmethod
    def _aligned(val, batched, rank):
        """Per-element-broadcast-correct operand: batched values already
        end in the lane axis; unbatched ones get a unit lane axis, plus
        leading units so per-element ranks align (numpy aligns right,
        and the lane axis occupies the last slot)."""
        if batched:
            return val
        v = val[..., None]
        while v.ndim < rank + 1:
            v = v[None]
        return v

    def run(self, jaxpr, const_pairs, arg_pairs):
        """const_pairs/arg_pairs: lists of (value, batched) bound to the
        jaxpr's constvars/invars. Returns (value, batched) per outvar."""
        from jax.extend.core import Literal

        env = {}

        def read(v):
            if isinstance(v, Literal):
                return (jnp.asarray(v.val), False)
            return env[v]

        def write(v, pair):
            env[v] = pair

        assert len(const_pairs) == len(jaxpr.constvars)
        assert len(arg_pairs) == len(jaxpr.invars)
        for var, pair in zip(jaxpr.constvars, const_pairs):
            write(var, (jnp.asarray(pair[0]), pair[1]))
        for var, pair in zip(jaxpr.invars, arg_pairs):
            write(var, (jnp.asarray(pair[0]), pair[1]))

        for eqn in jaxpr.eqns:
            ins = [read(v) for v in eqn.invars]
            outs = self._eval_eqn(eqn, ins)
            for var, pair in zip(eqn.outvars, outs):
                write(var, pair)
        return [read(v) for v in jaxpr.outvars]

    # -- op rules ------------------------------------------------------------

    def _eval_eqn(self, eqn, ins):
        prim = eqn.primitive.name
        params = eqn.params
        vals = [v for v, _ in ins]
        bats = [b for _, b in ins]

        if prim in ("pjit", "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr", "closed_call"):
            sub = (params.get("jaxpr") or params.get("call_jaxpr")
                   or params.get("fun_jaxpr"))
            return self.run(sub.jaxpr,
                            [(c, False) for c in sub.consts],
                            list(ins))

        if not any(bats):
            # pure per-element constant math: evaluate as-is, unbatched
            out = eqn.primitive.bind(*vals, **params)
            if not eqn.primitive.multiple_results:
                out = [out]
            return [(o, False) for o in out]

        if prim in _ELEMENTWISE:
            rank = max(v.ndim - (1 if b else 0)
                       for v, b in zip(vals, bats))
            ops = [self._aligned(v, b, rank)
                   for v, b in zip(vals, bats)]
            # lax primitives take equal shapes only — broadcast
            # explicitly (jnp-level implicit broadcasting is a
            # convenience the primitives themselves don't have)
            shape = jnp.broadcast_shapes(*(o.shape for o in ops))
            ops = [jnp.broadcast_to(o, shape) for o in ops]
            return [(eqn.primitive.bind(*ops, **params), True)]

        if prim in _REDUCES:
            (v,) = vals
            return [(eqn.primitive.bind(v, **params), True)]

        if prim == "broadcast_in_dim":
            (v,) = vals
            bt = v.shape[-1]
            shape = tuple(params["shape"]) + (bt,)
            bdims = tuple(params["broadcast_dimensions"]) + (
                len(shape) - 1,)
            return [(jax.lax.broadcast_in_dim(v, shape, bdims), True)]

        if prim in ("reshape", "squeeze"):
            (v,) = vals
            bt = v.shape[-1]
            if prim == "squeeze":
                newshape = tuple(s for i, s in enumerate(v.shape[:-1])
                                 if i not in params["dimensions"])
            else:
                if params.get("dimensions") is not None:
                    raise NotImplementedError("reshape with dimensions")
                newshape = tuple(params["new_sizes"])
            # the lane axis is LAST, so a per-element reshape is exactly
            # a reshape of the leading axes
            return [(v.reshape(newshape + (bt,)), True)]

        if prim == "transpose":
            (v,) = vals
            perm = tuple(params["permutation"]) + (v.ndim - 1,)
            return [(jnp.transpose(v, perm), True)]

        if prim == "concatenate":
            dim = params["dimension"]
            rank = max(v.ndim - (1 if b else 0)
                       for v, b in zip(vals, bats))
            bt = next(v.shape[-1] for v, b in zip(vals, bats) if b)
            ops = []
            for v, b in zip(vals, bats):
                o = self._aligned(v, b, rank)
                if o.shape[-1] != bt:   # unit lane from an unbatched op
                    o = jnp.broadcast_to(o, o.shape[:-1] + (bt,))
                ops.append(o)
            return [(jax.lax.concatenate(ops, dim), True)]

        if prim == "slice":
            (v,) = vals
            bt = v.shape[-1]
            start = tuple(params["start_indices"]) + (0,)
            limit = tuple(params["limit_indices"]) + (bt,)
            strides = params["strides"]
            strides = (tuple(strides) + (1,)) if strides else None
            return [(jax.lax.slice(v, start, limit, strides), True)]

        if prim == "iota":
            out = eqn.primitive.bind(**params)
            return [(out, False)]

        if prim == "dot_general":
            return [(self._dot(vals, bats, params), True)]

        raise NotImplementedError(
            f"megakernel adapter: unsupported primitive '{prim}'")

    def _dot(self, vals, bats, params):
        (lc, rc), (lb, rb) = params["dimension_numbers"]
        if lb or rb:
            raise NotImplementedError("batched per-element dot_general")
        lhs, rhs = vals
        lhs_b, rhs_b = bats
        import math

        def prep(v, b, contract):
            # -> (array (F..., C..., bt), n_free), free dims FIRST
            # (leading-axis indexing lowers; middle-axis does not)
            nd = v.ndim - (1 if b else 0)
            free = [i for i in range(nd) if i not in contract]
            perm = free + list(contract) + ([nd] if b else [])
            v = jnp.transpose(v, perm)
            if not b:
                v = v[..., None]
            return v, len(free)

        lp, nlf = prep(lhs, lhs_b, lc)
        rp, nrf = prep(rhs, rhs_b, rc)
        lf = lp.shape[:nlf]
        rf = rp.shape[:nrf]
        n_out = math.prod(lf) * math.prod(rf)
        if n_out > _MAX_UNROLL_FREE:
            raise NotImplementedError(
                f"dot_general free size {n_out} too large to unroll")
        acc = params.get("preferred_element_type") or lhs.dtype

        def entries(v, nf):
            if nf == 0:
                return [v]
            out = [v]
            for _ in range(nf):
                out = [o[i] for o in out for i in range(o.shape[0])]
            return out

        lents = entries(lp, nlf)
        rents = entries(rp, nrf)
        nc = len(lc)
        ents = []
        for le in lents:
            for re_ in rents:
                prod = (le * re_).astype(acc)   # (C..., bt')
                for _ in range(nc):
                    prod = jnp.sum(prod, axis=0)
                ents.append(prod)               # (bt,) or (1,)
        bt = max(e.shape[-1] for e in ents)
        ents = [jnp.broadcast_to(e, (bt,)) for e in ents]
        out = (jnp.stack(ents, axis=0) if len(ents) > 1
               else ents[0][None])
        return out.reshape(tuple(lf) + tuple(rf) + (bt,))


def _eval_rewritten(jaxpr, consts, *args):
    """Per-element evaluation through the interpreter (no lane axis);
    used by tests and bisect harnesses."""
    mb = _MinorBatch()
    outs = mb.run(jaxpr, [(c, False) for c in consts],
                  [(a, False) for a in args])
    return [v for v, _ in outs]


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
    # Hoisted constants ride shared_data with a trailing unit LANE axis
    # (Mosaic-proven input shapes: gx[:, None]-style columns, never bare
    # 1-D). Inside the interpreter they are "batched with lane 1" — unit
    # lanes broadcast against the true lane tile in every rule.
    consts = [jnp.asarray(c)[..., None] for c in closed.consts]

    def products_minor(p_m, *args):
        dl, cs = args[:nd], args[nd:]
        mb = _MinorBatch()
        outs = mb.run(closed.jaxpr,
                      [(c, True) for c in cs],
                      [(a, True) for a in (p_m,) + tuple(dl)])
        (n2, n2_b), (jtx, _), (jtj, _) = outs
        bt = p_m.shape[-1]
        if not n2_b:
            n2 = jnp.broadcast_to(n2[..., None], (bt,))
        return n2.reshape(1, bt), jtx, jtj

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

        # AOT compile probe on abstract shapes: surfaces Mosaic
        # lowering/compile failures HERE, where the caller can still
        # fall back to the XLA path, instead of asynchronously at the
        # first fetch (eager callers) or as a poisoned outer compile
        # (jitted callers).
        jitted = jax.jit(solve)
        specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (p0_in,) + data_in)
        compiled = jitted.lower(*specs).compile()
        if jax.core.is_concrete(p0_in):
            res = compiled(p0_in, *data_in)
        else:
            # caller jitted around this entry point: trace the solve
            # INLINE (an AOT executable cannot take tracers)
            res = solve(p0_in, *data_in)
        if padded_B != B:
            res = jax.tree_util.tree_map(lambda a: a[:B], res)
        return res

    return run


def _env_disabled() -> bool:
    return os.environ.get("LIBDOGLEG_TPU_NO_MEGAKERNEL", "") not in ("", "0")
