"""Honest device timing on backends with asynchronous remote dispatch.

On the tunneled TPU backend used in this environment,
jax.block_until_ready() returns before the computation actually finishes,
and dispatches whose results are never fetched can be elided entirely —
naive wall-clock benchmarks measure dispatch, not compute (observed:
"444 TFLOP/s" f32 Cholesky on a ~49 TFLOP/s chip). Two things make a
measurement real here:

  1. a host transfer that data-depends on the result (the only true
     completion barrier), and
  2. a serial data dependency between repetitions, so no repetition can be
     skipped or overlapped away.

measure_loop() runs K dependent repetitions of the kernel inside one jitted
lax.fori_loop (dynamic trip count -> compiled once), each iteration's input
perturbed by a scalar derived from the previous output, ends with one
dependent fetch, and reports (t(K2) - t(K1)) / (K2 - K1): per-iteration
device seconds with the tunnel round-trip (~50 ms) cancelled.

Validated against rooflines: 4096^3 f32 matmul measures ~45 TFLOP/s on a
v5e (~92% of the 49 TFLOP/s MXU peak); the naive method reported 315.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def fetch(out) -> float:
    """Completion barrier: host-fetch a scalar that depends on every output
    leaf."""
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    acc = 0.0
    for leaf in leaves:
        x = leaf
        if not (jnp.issubdtype(x.dtype, jnp.floating)
                or jnp.issubdtype(x.dtype, jnp.integer)):
            x = x.astype(jnp.int32)
        acc = acc + jnp.sum(x).astype(jnp.float32)
    return float(acc)


def measure_loop(kernel: Callable, *args,
                 budget_s: float = 0.5,
                 eps: float = 1e-30) -> float:
    """Per-call device seconds for kernel(*args).

    kernel's first argument must be a float array; each loop iteration calls
    kernel with that argument perturbed by eps * (a scalar reduced from the
    previous iteration's output), forcing serial execution of every
    repetition. eps is tiny (or exactly 0.0 once multiplied by a ~1 scalar
    at 1e-30) so the kernel's numerical behavior is unchanged.

    Rep counts are budgeted: one calibration run estimates the per-iteration
    cost, then k2 is chosen so the differenced window is ~budget_s of device
    time (clamped to [2, 8192]) — slow kernels get few reps, fast kernels
    enough to clear the ~50 ms round-trip jitter.
    """
    first, rest = args[0], args[1:]
    eps = jnp.asarray(eps, first.dtype) if jnp.issubdtype(
        jnp.asarray(first).dtype, jnp.floating) else 1e-30

    def body(i, carry):
        dep, _ = carry
        out = kernel(first + eps * dep, *rest)
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")
                  and jnp.issubdtype(l.dtype, jnp.floating)]
        dep_new = sum(jnp.sum(l).astype(first.dtype) for l in leaves)
        # clamp so the dependency scalar can't grow/NaN across iterations
        dep_new = jnp.where(jnp.isfinite(dep_new),
                            jnp.clip(dep_new, -1.0, 1.0), 0.0)
        return dep_new, out

    @jax.jit
    def run_k(k):
        init = body(0, (jnp.asarray(0.0, first.dtype), None))
        return jax.lax.fori_loop(1, k, body, init)

    fetch(run_k(1))        # compile + settle

    def timed(k):
        t0 = time.perf_counter()
        fetch(run_k(k))
        return time.perf_counter() - t0

    t_one = timed(1)       # ~ roundtrip + 1 iteration
    # calibrate: how many iterations fit the budget? The delta can be
    # swallowed by round-trip jitter for mid-speed kernels, so floor the
    # estimate (bounding k2) and re-check after the k1 run.
    t_cal = timed(8)
    est_iter = max((t_cal - t_one) / 7.0, 1e-4)
    k2 = int(min(max(budget_s / est_iter, 2), 8192))
    k1 = max(k2 // 4, 1)
    if k2 <= 9:            # slow kernel: the calibration pair IS the answer
        return max((t_cal - t_one) / 7.0, 1e-12)
    t1 = timed(k1)
    if t1 > 2.0 * budget_s:
        # calibration underestimated (jitter); don't run 4x more reps
        return max((t1 - t_one) / max(k1 - 1, 1), 1e-12)
    t2 = timed(k2)
    return max((t2 - t1) / (k2 - k1), 1e-12)
