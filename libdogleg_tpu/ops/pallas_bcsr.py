"""Pallas TPU kernels for block-sparse Jacobian products.

The reference's sparse path hands CHOLMOD a scalar CSR matrix and loops over
nonzeros one double at a time (reference dogleg.c:249-281). The TPU-native
equivalent for *large* block-sparse Jacobians is a supernodal-style schedule:
the host-side symbolic analysis (sparsity.py / BCSRStructure) emits a static,
sorted work list of block pairs, and a Pallas kernel streams the (bm, bn)
value tiles through VMEM, contracts them on the MXU, and accumulates each
output tile in VMEM across its contiguous run of the schedule (the standard
revisiting-output accumulation pattern).

These kernels target tile-friendly block shapes (bm multiple of 8, bn
multiple of 128 for f32) — the "supernodal MXU tiles" regime of SURVEY.md
section 7 hard-part 1. For small blocks (BA point blocks of size 2x3 etc.)
the XLA gather/einsum/scatter path in ops.bcsr remains the right choice; the
public wrappers fall back automatically.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.

Measured on one v5e chip (512x16 block grid, (32,128) blocks, 25% density,
13.5k scheduled pairs): the JtJ kernel matches the XLA gather/einsum/scatter
path bit-for-bit at equal wall time; the single-block-per-step matvec is
latency-bound and ~1.6x slower than XLA's segment-sum. The XLA paths in
ops.bcsr therefore remain the defaults; these kernels are the substrate for
the block-sparse (supernodal) Cholesky, where VMEM-resident accumulation
across a static schedule is the part XLA cannot express.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libdogleg_tpu.ops.bcsr import BCSRJacobian, BCSRStructure


class JtJSchedule(NamedTuple):
    """Static (host-side) work list for block-JtJ formation: for every pair
    of stored blocks sharing a block row, one MXU contraction; pairs sorted
    by output block so each output tile is one contiguous accumulation run.
    This is the symbolic-analysis artifact — computed once per structure
    (mirroring the reference's single cholmod_analyze, dogleg.c:649-654)."""
    pair_i: np.ndarray    # (npairs,) int32 index into values
    pair_j: np.ndarray    # (npairs,) int32 index into values
    out_idx: np.ndarray   # (npairs,) int32 index into the output block list
    out_ci: np.ndarray    # (nnzb_out,) block-row (state) coordinate
    out_cj: np.ndarray    # (nnzb_out,) block-col (state) coordinate


def build_jtj_schedule(s: BCSRStructure) -> JtJSchedule:
    # Native (C++) fast path for large patterns; numpy fallback below.
    from libdogleg_tpu.native.symbolic import jtj_schedule_native
    nat = jtj_schedule_native(s.indptr, s.indices, s.nbcol)
    if nat is not None:
        pi, pj, out_idx, out_ci, out_cj = nat
        return JtJSchedule(pair_i=pi, pair_j=pj, out_idx=out_idx,
                           out_ci=out_ci, out_cj=out_cj)
    pi, pj = s.jtj_pairs()
    ci = s.indices[pi]
    cj = s.indices[pj]
    order = np.lexsort((cj, ci))
    pi, pj, ci, cj = pi[order], pj[order], ci[order], cj[order]
    keys = ci.astype(np.int64) * s.nbcol + cj
    uniq, out_idx = np.unique(keys, return_inverse=True)
    return JtJSchedule(pair_i=pi.astype(np.int32),
                       pair_j=pj.astype(np.int32),
                       out_idx=out_idx.astype(np.int32),
                       out_ci=(uniq // s.nbcol).astype(np.int32),
                       out_cj=(uniq % s.nbcol).astype(np.int32))


def _tile_friendly(s: BCSRStructure, dtype) -> bool:
    min_sub = {jnp.float32: 8, jnp.bfloat16: 16}.get(
        jnp.dtype(dtype).type, 8)
    return (s.block_rows % min_sub == 0) and (s.block_cols % 128 == 0)


def _jtj_kernel(pi_ref, pj_ref, oi_ref, a_ref, b_ref, out_ref):
    p = pl.program_id(0)
    prev = jnp.maximum(p - 1, 0)
    first = (p == 0) | (oi_ref[p] != oi_ref[prev])
    contrib = jax.lax.dot_general(
        a_ref[0], b_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype)

    @pl.when(first)
    def _():
        out_ref[0] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _jtj_blocks_call(values, scalars, nnzb_out, bn, interpret):
    pi, pj, oi = scalars
    npairs = pi.shape[0]
    bm = values.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(npairs,),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda p, pi, pj, oi: (pi[p], 0, 0)),
            pl.BlockSpec((1, bm, bn), lambda p, pi, pj, oi: (pj[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, bn),
                               lambda p, pi, pj, oi: (oi[p], 0, 0)),
    )
    return pl.pallas_call(
        _jtj_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nnzb_out, bn, bn), values.dtype),
        interpret=interpret,
    )(pi, pj, oi, values, values)


def bcsr_jtj_blocks_pallas(J: BCSRJacobian,
                           schedule: Optional[JtJSchedule] = None,
                           *,
                           interpret: Optional[bool] = None):
    """Block-sparse J^T J via the Pallas MXU kernel.

    Returns (blocks (nnzb_out, bn, bn), schedule): the block-sparse JtJ in
    the schedule's output pattern — the natural input for a future
    block-sparse Cholesky. Use jtj_blocks_to_dense to materialize.
    """
    s = J.structure
    if schedule is None:
        schedule = build_jtj_schedule(s)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scalars = (jnp.asarray(schedule.pair_i), jnp.asarray(schedule.pair_j),
               jnp.asarray(schedule.out_idx))
    blocks = _jtj_blocks_call(J.values, scalars,
                              int(schedule.out_ci.shape[0]),
                              s.block_cols, bool(interpret))
    return blocks, schedule


def jtj_blocks_to_dense(blocks, schedule: JtJSchedule,
                        s: BCSRStructure) -> jnp.ndarray:
    out = jnp.zeros((s.nbcol, s.nbcol, s.block_cols, s.block_cols),
                    blocks.dtype)
    out = out.at[jnp.asarray(schedule.out_ci),
                 jnp.asarray(schedule.out_cj)].set(blocks)
    out = jnp.transpose(out, (0, 2, 1, 3))
    return out.reshape(s.nstate, s.nstate)


def bcsr_jtj_dense_pallas(J: BCSRJacobian,
                          schedule: Optional[JtJSchedule] = None,
                          *,
                          interpret: Optional[bool] = None) -> jnp.ndarray:
    """Dense JtJ via the Pallas block kernel (one scatter per output block,
    no duplicate-index accumulation — the pairs were reduced in VMEM)."""
    if schedule is None:
        schedule = build_jtj_schedule(J.structure)
    blocks, schedule = bcsr_jtj_blocks_pallas(J, schedule,
                                              interpret=interpret)
    return jtj_blocks_to_dense(blocks, schedule, J.structure)


def _matvec_kernel(idx_ref, row_ref, vals_ref, v_ref, out_ref):
    # v and out live whole in VMEM (they are Nstate/Nmeas-sized vectors —
    # tiny next to the streamed value tiles); the value tile is fetched per
    # grid step. Dynamic VMEM indexing replaces the gather/scatter the XLA
    # path pays for.
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    contrib = jax.lax.dot_general(
        vals_ref[0], v_ref[idx_ref[p]],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype)
    r = row_ref[p]
    out_ref[r] = out_ref[r] + contrib


def bcsr_matvec_pallas(J: BCSRJacobian, v: jnp.ndarray,
                       *, interpret: Optional[bool] = None) -> jnp.ndarray:
    """J v with value tiles streamed through VMEM in CSR order, accumulating
    into a VMEM-resident output vector."""
    s = J.structure
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    row = jnp.asarray(s.row_of_block())
    idx = jnp.asarray(s.indices)
    vb = v.reshape(s.nbcol, s.block_cols)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s.nnzb,),
        in_specs=[
            pl.BlockSpec((1, s.block_rows, s.block_cols),
                         lambda p, idx, row: (p, 0, 0)),
            pl.BlockSpec((s.nbcol, s.block_cols),
                         lambda p, idx, row: (0, 0)),
        ],
        out_specs=pl.BlockSpec((s.nbrow, s.block_rows),
                               lambda p, idx, row: (0, 0)),
    )
    out = pl.pallas_call(
        _matvec_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s.nbrow, s.block_rows),
                                       J.values.dtype),
        interpret=bool(interpret),
    )(idx, row, J.values, vb)
    return out.reshape(s.nmeas)


def supports_pallas(s: BCSRStructure, dtype=jnp.float32) -> bool:
    """True when the block shape maps onto TPU tiles well enough for the
    Pallas kernels to beat the XLA gather/scatter path."""
    return _tile_friendly(s, dtype)
