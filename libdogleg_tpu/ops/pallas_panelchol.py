"""Pallas panel kernel for the large-N dense Cholesky.

ops/largechol.py restructures the n>256 factorization so the trailing
updates — carrying ~97% of the n^3/3 flops — run as MXU GEMMs. What keeps
it below XLA's own lax.linalg lowering (measured 2.29 vs 4.48 TFLOP/s at
n=2048 b=8, BENCH_KERNELS_r04.json) is the OTHER 3%: the per-panel
diagonal-block factorization runs as a fori_loop of 16 small dependent XLA
ops per sub-panel plus a recursive triangular inverse, and that op-latency
chain — not the GEMMs — is the critical path.

This kernel removes the chain: ONE pallas_call factors the (p, p)
diagonal block AND produces its triangular inverse, entirely in VMEM.
The surrounding largechol loop then contains exactly three ops per panel:
this kernel, the panel GEMM `W[rest, kk] @ inv(Lkk)^T`, and the trailing
GEMM `W[rest, rest] -= P P^T` — all MXU work.

In-kernel structure (p a multiple of 16, all shapes static):
  phase 1 — blocked right-looking over 16-wide sub-panels: an unrolled
    column-form 16x16 leaf Cholesky (row shapes (k, 1)/(1, k); Mosaic
    pitfalls per ops/pallas_mega.py: iota-built masks, no bool carries,
    no array constants), an unrolled leaf triangular inverse, then the
    sub-panel trsm and rank-16 trailing update as in-kernel MXU dots on
    a shrinking VALUE (static slices, no ref aliasing);
  phase 2 — the full (p, p) inverse assembled from the 16x16 leaf
    inverses by the halving recursion inv([[A,0],[C,B]]) =
    [[Ai,0],[-Bi C Ai, Bi]], ~2 MXU dots per merge node.

Failure contract matches smallchol/blockchol: ok is the all-pivots
positive-and-finite flag consumed by the escalating-lambda loop
(reference dogleg.c:667,806 info-signal semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 16


def _leaf_chol(D):
    """Unrolled column-form Cholesky of a (SUB, SUB) block.
    Returns (L lower, ok (1, 1) f32 0/1)."""
    m = D.shape[0]
    dt = D.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dt)
    ok = jnp.ones((1, 1), dt)
    cols = []
    for j in range(m):
        acc = D[:, j:j + 1]                        # (m, 1)
        for k in range(j):
            acc = acc - cols[k] * cols[k][j:j + 1, :]
        d2 = acc[j:j + 1, :]                       # (1, 1)
        ok = ok * (d2 > 0).astype(dt) * jnp.isfinite(d2).astype(dt)
        d = jnp.sqrt(jnp.maximum(d2, tiny))
        col = acc / d
        rowmask = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) >= j
        cols.append(jnp.where(rowmask, col, jnp.zeros_like(col)))
    return jnp.concatenate(cols, axis=1), ok


def _leaf_tri_inv(L):
    """Unrolled row-form inverse of a (SUB, SUB) lower-triangular block.
    Rows built front-to-back; identity rows from iota (array constants
    cannot be captured in a Pallas kernel)."""
    m = L.shape[0]
    dt = L.dtype
    colidx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    rows = []
    for i in range(m):
        r = (colidx == i).astype(dt)               # e_i as (1, m)
        for k in range(i):
            r = r - L[i:i + 1, k:k + 1] * rows[k]
        rows.append(r / L[i:i + 1, i:i + 1])
    return jnp.concatenate(rows, axis=0)


def _dot(a, b):
    # precision=HIGHEST: without it Mosaic lowers f32 dots to bf16
    # multiplies (measured: 5e-3 max rel err on the n=2048 factor vs
    # 5e-6 with true-f32 passes; the factor feeds GN solves whose
    # thresholds sit at 1e-3..1e-5)
    return jnp.dot(a, b, preferred_element_type=a.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _make_kernel(p: int):
    nb = p // SUB

    def kernel(w_ref, l_ref, linv_ref, ok_ref):
        dt = w_ref.dtype
        T = w_ref[0]                               # (p, p) value
        ok = jnp.ones((1, 1), dt)
        lcols = []                                 # (p, SUB) column blocks
        leaf_invs = []

        # phase 1: blocked right-looking on a shrinking trailing value
        for k in range(nb):
            j0 = k * SUB
            D = T[:SUB, :SUB]
            Lkk, okk = _leaf_chol(D)
            ok = ok * okk
            Li = _leaf_tri_inv(Lkk)
            leaf_invs.append(Li)
            parts = ([jnp.zeros((j0, SUB), dt), Lkk] if j0 else [Lkk])
            if j0 + SUB < p:
                X = _dot(T[SUB:, :SUB], Li.T)      # (rest, SUB)
                T = T[SUB:, SUB:] - _dot(X, X.T)   # (rest, rest)
                parts.append(X)
            lcols.append(jnp.concatenate(parts, axis=0)
                         if len(parts) > 1 else parts[0])
        L = jnp.concatenate(lcols, axis=1) if nb > 1 else lcols[0]

        # phase 2: full triangular inverse by halving recursion over the
        # leaf inverses (merge cost: 2 MXU dots per node)
        def tri_inv(j0, m):
            if m == SUB:
                return leaf_invs[j0 // SUB]
            h = SUB * max(1, (m // 2) // SUB)
            Ai = tri_inv(j0, h)
            Bi = tri_inv(j0 + h, m - h)
            C = L[j0 + h:j0 + m, j0:j0 + h]
            Ci = -_dot(_dot(Bi, C), Ai)
            top = jnp.concatenate(
                [Ai, jnp.zeros((h, m - h), dt)], axis=1)
            bot = jnp.concatenate([Ci, Bi], axis=1)
            return jnp.concatenate([top, bot], axis=0)

        l_ref[0] = L
        linv_ref[0] = tri_inv(0, p)
        ok_ref[0] = ok

    return kernel


def panel_factor(W, *, interpret: bool = False):
    """Factor (..., p, p) SPD diagonal blocks in one whole-panel kernel.

    Returns (L, Linv, ok) with L lower-Cholesky, Linv = inv(L), and ok a
    (...,)-shaped bool (all pivots positive and finite). p must be a
    multiple of 16. Batch dims map to the Pallas grid, one program per
    instance.
    """
    batch = W.shape[:-2]
    p = W.shape[-1]
    if p % SUB:
        raise ValueError(f"panel width {p} not a multiple of {SUB}")
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    Wf = W.reshape(B, p, p)

    blk = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    L, Linv, ok = pl.pallas_call(
        _make_kernel(p),
        grid=(B,),
        in_specs=[blk((p, p))],
        out_specs=(blk((p, p)), blk((p, p)),
                   # last two dims must equal the overall array's (the
                   # (1,1)-of-(B,1) form violates Mosaic's 8/128 block
                   # divisibility when B > 1)
                   pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, p, p), W.dtype),
                   jax.ShapeDtypeStruct((B, p, p), W.dtype),
                   jax.ShapeDtypeStruct((B, 1, 1), W.dtype)),
        interpret=interpret,
    )(Wf)
    okb = (ok[:, 0, 0] > 0.5).reshape(batch) if batch \
        else (ok[0, 0, 0] > 0.5)
    return L.reshape(W.shape), Linv.reshape(W.shape), okb
