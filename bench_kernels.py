"""Hot-kernel microbenchmarks with speed-of-light comparisons.

BASELINE.md asks for "the Cholesky-factorization step at speed-of-light per
chip". This script measures the framework's hot kernels on the session TPU
and reports the achieved fraction of the relevant roofline bound:

  * batched small Cholesky (the batched-solve hot kernel) — HBM-bandwidth
    bound (tiny flops per byte), so SoL = bytes_moved / HBM_BW
  * JtJ formation (the per-attempt MXU contraction)       — HBM bound at
    small n (n=6 blocks are far below the MXU tile)
  * large matmul (calibration)                            — MXU bound
  * large dense Cholesky (lax.linalg)                     — MXU bound
  * block-sparse level-scheduled Cholesky                 — factorizations/s
    (its bound is the elimination-tree critical path, not a chip roofline)

All timing via utils.benchtime.measure_loop (dependent in-jit repetitions,
differenced) — naive wall-clock on this tunneled backend measures dispatch,
not compute. MXU peaks are the default-precision (bf16-multiply,
f32-accumulate) rates, which is what jnp matmul uses on TPU. Peaks by
device generation are estimates; trends across commits are the signal.
One JSON line per kernel.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from libdogleg_tpu.utils.benchtime import measure_loop

# (MXU TFLOP/s at default precision, HBM GB/s) by device-kind substring
_PEAKS = {
    "v5 lite": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "cpu": (0.5, 50.0),
}


def peaks():
    kind = jax.devices()[0].device_kind.lower()
    for key, val in _PEAKS.items():
        if key in kind:
            return val
    return _PEAKS["v5e"]


def emit(kernel, value, unit, **extra):
    print(json.dumps({"kernel": kernel, "value": round(float(value), 3),
                      "unit": unit, **extra}))


def bench_matmul_calibration(n=4096):
    rng = np.random.default_rng(9)
    M = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n))
    dt = measure_loop(lambda a: a @ a, M)
    tflops = 2 * n ** 3 / dt / 1e12
    mxu, _ = peaks()
    emit("matmul_calibration", tflops, "TFLOP/s", n=n,
         sol_frac=round(tflops / mxu, 3), bound="MXU")


def bench_small_cholesky(batch=262144, n=6):
    # batch sized to stay clear of HBM pressure: (batch, 6, 6) f32 tiles
    # pad (6,6)->(8,128) on TPU, a ~28x physical footprint
    from libdogleg_tpu.ops.smallchol import small_cholesky
    rng = np.random.default_rng(0)
    A = rng.normal(size=(batch, n, n)).astype(np.float32)
    spd = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                      + 4 * np.eye(n, dtype=np.float32))
    dt = measure_loop(lambda a: small_cholesky(a)[0], spd)
    gbytes = batch * (2 * n * n * 4) / 1e9   # read A, write L
    _, hbm = peaks()
    emit("small_cholesky_batched", batch / dt / 1e6, "Mfact/s",
         n=n, batch=batch, achieved_gbps=round(gbytes / dt, 1),
         sol_frac=round(gbytes / dt / hbm, 3), bound="HBM")


def bench_jtj_formation(batch=32768, m=100, n=6):
    rng = np.random.default_rng(1)
    J = jnp.asarray(rng.normal(size=(batch, m, n)).astype(np.float32))
    dt = measure_loop(
        lambda a: jnp.einsum('bmi,bmj->bij', a, a,
                             preferred_element_type=jnp.float32), J)
    gbytes = batch * (m * n + n * n) * 4 / 1e9
    mxu, hbm = peaks()
    tflops = batch * 2 * m * n * n / dt / 1e12
    emit("jtj_formation_batched", round(gbytes / dt, 1), "GB/s",
         batch=batch, m=m, n=n,
         sol_frac=round(gbytes / dt / hbm, 3), bound="HBM",
         achieved_tflops=round(tflops, 2))


def bench_dense_cholesky(n=2048, batch=8):
    rng = np.random.default_rng(2)
    A = rng.normal(size=(batch, n, n)).astype(np.float32)
    spd = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                      + n * np.eye(n, dtype=np.float32))
    dt = measure_loop(jnp.linalg.cholesky, spd)
    tflops = batch * (n ** 3 / 3) / dt / 1e12
    mxu, _ = peaks()
    emit("dense_cholesky", tflops, "TFLOP/s", n=n, batch=batch,
         sol_frac=round(tflops / mxu, 3), bound="MXU",
         note="sequential panel algorithm; SoL fraction is algorithmic")


def bench_blocked_cholesky(batch=512, n=64):
    """The mid-size batched factorization (ops/blockchol.py, config 8's hot
    kernel). HBM-bound like small_cholesky (n=64 f32 is 16 KB/matrix);
    also reports the lax.linalg baseline it replaced."""
    from libdogleg_tpu.ops.blockchol import blocked_cholesky
    rng = np.random.default_rng(4)
    A = rng.normal(size=(batch, n, n)).astype(np.float32)
    spd = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                      + n * np.eye(n, dtype=np.float32))
    dt = measure_loop(lambda a: blocked_cholesky(a)[0], spd)
    dt_xla = measure_loop(jnp.linalg.cholesky, spd)
    gbytes = batch * (2 * n * n * 4) / 1e9
    _, hbm = peaks()
    emit("blocked_cholesky_batched", batch / dt / 1e3, "kfact/s",
         n=n, batch=batch, achieved_gbps=round(gbytes / dt, 1),
         sol_frac=round(gbytes / dt / hbm, 3), bound="HBM",
         xla_lax_linalg_ms=round(dt_xla * 1e3, 2),
         speedup_vs_xla=round(dt_xla / dt, 1))


def bench_sparse_cholesky(nb=256, b=64, band=3):
    from libdogleg_tpu import sparse_cholesky as sc
    rows = np.array([i for j in range(nb)
                     for i in range(j, min(nb, j + band))])
    cols = np.array([j for j in range(nb)
                     for i in range(j, min(nb, j + band))])
    t0 = time.perf_counter()
    sym = sc.analyze(rows, cols, nb, b)
    analyze_s = time.perf_counter() - t0
    rng = np.random.default_rng(3)
    blocks = rng.normal(size=(rows.shape[0], b, b)).astype(np.float32) * 0.1
    diag = rows == cols
    blocks[diag] = (blocks[diag] @ np.swapaxes(blocks[diag], -1, -2)
                    + np.eye(b, dtype=np.float32) * (3 + band))
    blocks = jnp.asarray(blocks)
    dt = measure_loop(lambda v: sc.factorize(sym, v, jnp.asarray(0.0))[0],
                      blocks)
    n_upd = sym.sched.upd_tgt.shape[0]
    n_sol = sym.sched.sol_tgt.shape[0]
    flops = (2 * n_upd + n_sol + nb / 3) * b ** 3
    emit("block_sparse_cholesky", 1.0 / dt, "fact/s",
         nb=nb, b=b, nnzb=int(rows.shape[0]), levels=sym.sched.nlevels,
         analyze_ms=round(analyze_s * 1e3, 1),
         achieved_tflops=round(flops / dt / 1e12, 3),
         bound="elimination-tree critical path")


if __name__ == "__main__":
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "backend": jax.default_backend()}))
    bench_matmul_calibration()
    bench_small_cholesky()
    bench_jtj_formation()
    bench_dense_cholesky()
    bench_blocked_cholesky()
    bench_sparse_cholesky()
