"""Pallas batched blocked Cholesky — the VMEM-resident form of
ops/blockchol.py.

Motivation (round-2 stretch attempt, VERDICT item 9): blockchol's
trace-time unrolling wins 19-26x over lax.linalg on batched mid-size
factorizations, but its compile time grows with n (tens of seconds at
n=64, ~100 s at n=128, and the naive swap into the supernodal scan body at
super-block 128 did not finish compiling in 20 minutes). A Pallas kernel
keeps the SAME algorithm — right-looking 16-panels: unrolled 16x16
diagonal Cholesky + unrolled 16-row triangular solve (VPU flat DAGs), MXU
trailing update — but runs the panel loop as a fori_loop over a
once-traced body, so compile cost is O(1) in n, and the whole working set
(one batch tile of matrices) stays in VMEM across stages.

TPU layout constraint that shapes the kernel: Mosaic only allows dynamic
slicing on the SUBLANE axis (multiples of the 8-row f32 tile); the lane
(last) axis would need 128-aligned offsets. So every per-stage access is a
row strip: the column panel of the classic right-looking algorithm is
recovered from the working matrix's symmetry (W[:, rest, kk] ==
W[:, kk, rest]^T), the diagonal block is extracted with a one-hot matmul
instead of a column slice, and the factor is built TRANSPOSED (U = L^T,
written one (b, n) row strip per stage); the wrapper transposes once at
the end.

VERDICT (v5e, f32, (512, 64, 64), round 2) — measured and SHELVED, same
policy as ops/pallas_chol.py:
  * runtime 3277 us at batch_tile=32 (3806 at 16) vs blockchol's 184 us
    and lax.linalg's 4849 us: beats XLA's lowering but loses 18x to the
    trace-unrolled blockchol. The per-stage work is too small to fill the
    MXU from one kernel instance, and the fori_loop serializes stages that
    XLA's flat DAG schedules freely across the batch.
  * accuracy 4.0e-3 max rel vs f64 (bf16 MXU multiplies inside the
    kernel's dot_generals) vs 1.9e-7 for blockchol's HIGHEST-precision
    panel updates; fixing it would slow the kernel further.
  * compile time IS excellent (3.8 s at batch_tile=16, O(1) in n vs
    blockchol's O(n) unroll grouth) — the one scenario to revisit this
    kernel is a context where compile budget, not runtime, binds.
Other Mosaic lessons recorded here: >2-int+newaxis indexing lowers as an
unsupported >2-D gather; an i1 vector fori carry/output crashes the
lowering (use f32 0/1); scalar-unrolled recurrences OOM the scoped-VMEM
stack because every (bt,) temporary pads to a full physical tile (use
column-vector forms, see _small_chol).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 16


def _small_chol(D):
    """Column-vector Cholesky of (bt, b, b), b static.

    smallchol.small_cholesky's scalar unrolling would create ~b^2/2 live
    (bt,) temporaries here, and Mosaic pads every one to a full physical
    tile — the kernel dies of scoped-VMEM stack OOM. This form keeps only
    b live (bt, b) column vectors (one padded tile each): classic
    column-Cholesky with the sub-diagonal zeroing done by a row-index
    mask."""
    bt, b, _ = D.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, b), 1)
    cols = []
    ok = None
    for j in range(b):
        c = D[:, :, j]                                   # (bt, b)
        for m in range(j):
            c = c - cols[m] * cols[m][:, j][:, None]
        piv = c[:, j]
        ok_j = (piv > 0) & jnp.isfinite(piv)
        ok = ok_j if ok is None else (ok & ok_j)
        cj = jnp.where(rows >= j, c * jax.lax.rsqrt(piv)[:, None], 0.0)
        cols.append(cj)
    return jnp.stack(cols, axis=-1), ok


def _fwd_solve_rows(Lkk, R):
    """Y with Lkk Y = R for R (bt, b, n): unrolled forward substitution
    over the b rows; each row op is a full-lane (bt, n) VPU vector op."""
    b = Lkk.shape[-1]
    Y = [None] * b
    for j in range(b):
        s = R[:, j, :]
        for m in range(j):
            s = s - Lkk[:, j, m][:, None] * Y[m]
        Y[j] = s / Lkk[:, j, j][:, None]
    return jnp.stack(Y, axis=1)


def _chol_kernel(a_ref, u_ref, ok_ref, w_ref, *, n: int, bt: int):
    b = BLOCK
    nb = n // b
    w_ref[:] = a_ref[:]

    def stage(k, ok):
        R = w_ref[:, pl.ds(k * b, b), :]                     # (bt, b, n)
        # diagonal block via one-hot matmul (no lane-dim slicing):
        # E[c, j] = 1 iff c == k*b + j
        col = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
        sel = jax.lax.broadcasted_iota(jnp.int32, (n, b), 1) + k * b
        E = (col == sel).astype(jnp.float32)                 # (n, b)
        D = jax.lax.dot_general(R, E, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        Lkk, okk = _small_chol(D)                            # (bt, b, b)
        # U row strip: Lkk^{-1} applied to the whole row strip, columns
        # left of the panel masked off, diagonal block written as Lkk^T
        Y = _fwd_solve_rows(Lkk, R)                          # (bt, b, n)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bt, b, n), 2)
        Ym = jnp.where(cols >= (k + 1) * b, Y, 0.0)
        LkkT = jnp.swapaxes(Lkk, -1, -2)
        diag_strip = jax.lax.dot_general(
            LkkT, E, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (bt, b, n)
        u_ref[:, pl.ds(k * b, b), :] = Ym + diag_strip
        # trailing Schur update: W -= Ym^T Ym (zero cols make it touch
        # only the rest x rest block)
        w_ref[:] = w_ref[:] - jax.lax.dot_general(
            Ym, Ym, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # f32 validity accumulator: an i1 vector carry/output crashes the
        # Mosaic lowering; min() is logical-and on {0.0, 1.0}
        return jnp.minimum(ok, okk.astype(jnp.float32))

    ok = jax.lax.fori_loop(0, nb, stage, jnp.ones((bt,), jnp.float32))
    ok_ref[:, 0] = ok


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def pallas_blocked_cholesky(A: jnp.ndarray, batch_tile: int = 0,
                            interpret: bool = False):
    """Cholesky of a (B, n, n) f32 SPD batch; n a multiple of 16. Returns
    (L, ok): L lower-triangular, ok per-matrix pivot validity (the in-jit
    dpotrf info / CHOLMOD minor signal, reference dogleg.c:667,806)."""
    B, n, _ = A.shape
    assert n % BLOCK == 0, n
    if not batch_tile:
        # ~10 live (bt, n, n)-tile equivalents: double-buffered in+out
        # blocks, the scratch, and the stage's matmul temporaries — sized
        # against the 16 MB scoped-VMEM limit with headroom
        batch_tile = max(1, min(B, (12 << 20) // (10 * n * n * 4)))
        while B % batch_tile:
            batch_tile -= 1
    bt = batch_tile
    kernel = functools.partial(_chol_kernel, n=n, bt=bt)
    U, ok = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((bt, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bt, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bt, n, n), jnp.float32)],
        interpret=interpret,
    )(A)
    return jnp.swapaxes(U, -1, -2), ok[:, 0] > 0.5
