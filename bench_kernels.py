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
    """XLA's lax.linalg lowering vs the recursive GEMM-dominant blocked
    form (ops/largechol.py, VERDICT r2 ask 3). The largechol ceiling is
    the HIGHEST-precision (true-f32) matmul rate, ~1/4 of the bf16 MXU
    peak — sol_frac_f32 reports against that; sol_frac stays against the
    bf16 peak for cross-round comparability."""
    from libdogleg_tpu.ops.largechol import large_cholesky
    rng = np.random.default_rng(2)
    A = rng.normal(size=(batch, n, n)).astype(np.float32)
    spd = jnp.asarray(A @ np.swapaxes(A, -1, -2)
                      + n * np.eye(n, dtype=np.float32))
    dt_xla = measure_loop(jnp.linalg.cholesky, spd)
    dt = measure_loop(lambda a: large_cholesky(a)[0], spd)
    flops = batch * (n ** 3 / 3)
    tflops = flops / dt / 1e12
    mxu, _ = peaks()
    emit("dense_cholesky", tflops, "TFLOP/s", n=n, batch=batch,
         algo="largechol blocked right-looking",
         sol_frac=round(tflops / mxu, 3),
         sol_frac_f32=round(tflops / (mxu / 4), 3), bound="MXU",
         xla_lax_linalg_tflops=round(flops / dt_xla / 1e12, 2),
         speedup_vs_xla=round(dt_xla / dt, 1))


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


def bench_e2e_roofline_config3(batch=8192):
    """END-TO-END roofline for the headline batched config (VERDICT r2
    ask 1): model the required bytes+flops of one solve attempt for one
    batch element of the config-3 program (quadratic-surface, n=6,
    m=100), then compare the measured whole-solve time against
    sum-of-attempts x per-attempt bound.

    Per-attempt cost model (f32, compact layout, perfect fusion):
      flops: model eval ~10/meas + analytic J ~12/meas entry-wise
             + Jt_x 2mn + JtJ 2mn^2 + factor n^3/3 + 3 triangular solves
      bytes: the while-loop carry must round-trip HBM once per attempt
             (read+write ~80 f32/element: p, Jt_x, JtJ, cached cauchy/GN
             /prev vectors, scalars) + the measurement vector read
             (m f32). J itself is fusable (never needs HBM).
    The bound is max(bytes/HBM_BW, flops/MXU) per attempt — this problem
    is HBM-carry-bound, flops are ~50x below the MXU line. 'Useful'
    attempts = sum over elements of n_attempts (wavefront waste on
    masked-done elements and compaction-phase structure count AGAINST
    the achieved fraction — this is solves out of how many possible)."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.parallel.batched import batched_optimize_compacted
    from libdogleg_tpu.solver import Products

    dtype = jnp.float32
    m, n = sp.NMEAS, sp.NSTATE
    gx, gy = sp.make_grid(dtype)
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)

    def products(p, meas):
        x = sp.model(p, gx, gy) - meas
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x,
                        Jt_x=jnp.matmul(J.T, x,
                                        preferred_element_type=dtype),
                        JtJ=jnp.matmul(J.T, J,
                                       preferred_element_type=dtype))

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), batch))

    def run(q, mm):
        r = batched_optimize_compacted(products, q, prm, problem_data=mm)
        return r.p, r.n_attempts

    _, n_att = jax.jit(run)(p0s, meas)
    useful = int(np.sum(np.asarray(n_att)))
    dt = measure_loop(lambda q, mm: run(q, mm), p0s, meas)

    flops = (10 * m + 12 * m          # residual + J entries
             + 2 * m * n + 2 * m * n * n   # Jt_x + JtJ
             + n ** 3 // 3 + 3 * 2 * n * n + 40 * n)
    carry_f32 = (3 * n + 1            # p, Jt_x, + norm2
                 + n * n              # JtJ
                 + 3 * (n + 2)        # cauchy/gn/prev + norms/flags
                 + 8)                 # lam, tr, counters, done, reason
    bytes_att = 2 * 4 * carry_f32 + 4 * m
    mxu, hbm = peaks()
    bound_att = max(bytes_att / (hbm * 1e9), flops / (mxu * 1e12))
    bound_solve = bound_att * useful / batch
    meas_att = dt / useful
    emit("end_to_end_config3", batch / dt, "solves/s",
         batch=batch, useful_attempts=useful,
         flops_per_attempt=flops, bytes_per_attempt=bytes_att,
         bound_ns_per_attempt=round(bound_att * 1e9, 3),
         measured_ns_per_attempt=round(meas_att * 1e9, 2),
         bound_solves_per_s=round(1.0 / bound_solve),
         sol_frac=round(bound_att / meas_att, 4),
         bound="HBM (carry+measurement round-trip per attempt)")


def bench_e2e_roofline_config3f(batch=8192):
    """End-to-end roofline for the FACTORED config-3 program
    (quadratic_surface.factored_products): per-attempt traffic is the
    solver carry plus 14 f32 of sufficient statistics — the measurement
    stream is gone, so the bound is pure carry round-trip. Compare
    against end_to_end_config3 to see what the reformulation buys and
    how close the solver core itself runs to the carry bound."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.parallel.batched import batched_optimize_compacted

    dtype = jnp.float32
    n = sp.NSTATE
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), batch))
    G_pair = sp.gram_pair(dtype)
    stats = jax.vmap(sp.factored_statistics)(meas)

    def run(q, s):
        r = batched_optimize_compacted(
            lambda p, st: sp.factored_products(p, st, G_pair), q, prm,
            problem_data=s)
        return r.p, r.n_attempts

    _, n_att = jax.jit(run)(p0s, stats)
    useful = int(np.sum(np.asarray(n_att)))
    dt = measure_loop(lambda q, s: run(q, s), p0s, stats)

    flops = (40 * n * n            # compensated 6x6 matvecs + JtJ forms
             + n ** 3 // 3 + 3 * 2 * n * n + 40 * n)
    carry_f32 = 3 * n + 1 + n * n + 3 * (n + 2) + 8
    bytes_att = 2 * 4 * carry_f32 + 4 * (2 * n + 2)
    mxu, hbm = peaks()
    bound_att = max(bytes_att / (hbm * 1e9), flops / (mxu * 1e12))
    emit("end_to_end_config3_factored", batch / dt, "solves/s",
         batch=batch, useful_attempts=useful,
         flops_per_attempt=flops, bytes_per_attempt=bytes_att,
         bound_ns_per_attempt=round(bound_att * 1e9, 3),
         measured_ns_per_attempt=round(dt / useful * 1e9, 2),
         sol_frac=round(bound_att / (dt / useful), 4),
         bound="HBM (solver carry round-trip only)")


def bench_e2e_roofline_config8(batch=512, nstate=64, meas_factor=4):
    """End-to-end roofline for the mid-size batched config (config 8,
    n=64): same accounting as config 3. Here the per-attempt traffic is
    dominated by re-reading the PROBLEM DATA (A, B, C: ~36k f32/element)
    every residual/Jacobian evaluation — required work, any solver must
    stream the data per attempt. flops ~4.4M/attempt sit ~10x under the
    MXU line at the HBM-bound time, so this config is also
    bandwidth-bound end to end."""
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.parallel.batched import batched_optimize
    from libdogleg_tpu.solver import Products

    dtype = jnp.float32
    n, m = nstate, meas_factor * nstate
    rng = np.random.default_rng(8)
    A = jnp.asarray(rng.normal(size=(batch, m, n)), dtype)
    Bm = jnp.asarray(rng.normal(size=(batch, n, n)) * 0.5 / np.sqrt(n),
                     dtype)
    C = jnp.asarray(rng.normal(size=(batch, m, n)) * 0.3, dtype)
    p_true = rng.normal(size=(batch, n))
    d_np = (np.einsum('bms,bs->bm', np.asarray(A),
                      np.tanh(np.einsum('bst,bt->bs', np.asarray(Bm),
                                        p_true)))
            + np.einsum('bms,bs->bm', np.asarray(C), p_true)
            + rng.normal(size=(batch, m)) * 0.01)
    d = jnp.asarray(d_np, dtype)
    p0s = jnp.asarray(p_true + rng.normal(size=(batch, n)) * 0.1, dtype)
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)

    def products(p, data):
        Ab, Bb, Cb, db = data
        t = jnp.tanh(Bb @ p)
        x = Ab @ t + Cb @ p - db
        J = jnp.matmul(Ab, ((1.0 - t * t)[:, None]) * Bb,
                       preferred_element_type=dtype) + Cb
        return Products(norm2_x=x @ x, Jt_x=J.T @ x,
                        JtJ=jnp.matmul(J.T, J,
                                       preferred_element_type=dtype))

    def run(q, data):
        r = batched_optimize(products, q, prm, problem_data=data)
        return r.p, r.n_attempts

    _, n_att = jax.jit(run)(p0s, (A, Bm, C, d))
    useful = int(np.sum(np.asarray(n_att)))
    dt = measure_loop(lambda q, data: run(q, data), p0s, (A, Bm, C, d))

    flops = (2 * n * n + 10 * n       # tanh(Bp)
             + 4 * m * n              # x = A t + C p - d
             + 2 * m * n * n + m * n  # J = A diag(1-t^2) B + C
             + 2 * m * n * n          # JtJ
             + 2 * m * n              # Jt_x
             + n ** 3 // 3 + 3 * 2 * n * n + 40 * n)
    data_f32 = m * n + n * n + m * n + m          # A, B, C, d read
    carry_f32 = 3 * n + 1 + n * n + 3 * (n + 2) + 8
    bytes_att = 4 * data_f32 + 2 * 4 * carry_f32
    mxu, hbm = peaks()
    bound_att = max(bytes_att / (hbm * 1e9), flops / (mxu * 1e12))
    emit("end_to_end_config8", batch / dt, "solves/s",
         batch=batch, nstate=n, useful_attempts=useful,
         flops_per_attempt=flops, bytes_per_attempt=bytes_att,
         bound_ns_per_attempt=round(bound_att * 1e9, 2),
         measured_ns_per_attempt=round(dt / useful * 1e9, 2),
         bound_solves_per_s=round(batch / (bound_att * useful)),
         sol_frac=round(bound_att / (dt / useful), 4),
         bound="HBM (problem-data stream per attempt)")


def bench_e2e_roofline_config3_mega(batch=8192,
                                    block_batches=(128, 256, 512, 1024)):
    """The whole-solve Pallas megakernel (ops/pallas_mega.py) on the
    headline config, swept over lane-tile widths. With the carry
    resident in VMEM across all attempts, per-solve HBM traffic is one
    problem read + one result write (~640 B/solve) — the HBM bound
    drops to ~0.8 ns/SOLVE and the kernel becomes VPU-compute-bound
    (~8.4 kflop/attempt elementwise). Reported against both bounds;
    best-effort (a Mosaic lowering failure emits an error row instead
    of crashing the harness)."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.ops.pallas_mega import megakernel_optimize

    dtype = jnp.float32
    m, n = sp.NMEAS, sp.NSTATE
    gx, gy = sp.make_grid(dtype)
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), batch))
    mxu, hbm = peaks()
    bytes_solve = 4 * (m + n + n + n * n + n + 6)  # read + write once
    flops_att = 10 * m + 12 * m + 2 * m * n + 2 * m * n * n \
        + 2 * (n ** 3 // 3 + 3 * 2 * n * n + 40 * n)

    for bt in block_batches:
        def run(q, mm):
            r = megakernel_optimize(sp.products_minor, q, prm,
                                    problem_data=(mm,),
                                    shared_data=(gx[:, None],
                                                 gy[:, None]),
                                    block_batch=bt)
            return r.p, r.n_attempts
        try:
            _, n_att = jax.jit(run)(p0s, meas)
            n_att = np.asarray(n_att)
            useful = int(n_att.sum())
            dt = measure_loop(lambda q, mm: run(q, mm), p0s, meas)
        except Exception as e:  # noqa: BLE001 — Mosaic lowering faults
            emit("end_to_end_config3_megakernel", 0.0, "solves/s",
                 block_batch=bt, error=f"{type(e).__name__}: {e}"[:300])
            continue
        bound_solve = bytes_solve / (hbm * 1e9)
        emit("end_to_end_config3_megakernel", batch / dt, "solves/s",
             batch=batch, block_batch=bt, useful_attempts=useful,
             measured_ns_per_attempt=round(dt / useful * 1e9, 2),
             hbm_bound_ns_per_solve=round(bound_solve * 1e9, 3),
             hbm_bound_solves_per_s=round(1.0 / bound_solve),
             flops_per_attempt=flops_att,
             sol_frac_hbm=round(bound_solve / (dt / batch), 4),
             bound="HBM one-pass per solve; kernel is VPU-compute-bound")


def bench_e2e_roofline_config3f_mega(batch=8192,
                                     block_batches=(256, 1024)):
    """Config 3f (sufficient statistics) inside the megakernel: the
    compound of both round-3 remedies plus VMEM residency. Per-solve
    HBM traffic is ~296 B (14 f32 of statistics + p0 in, results out);
    per-attempt VPU work ~1 kflop (compensated G c - h + hand-applied
    T structure) — ~8x less than the general kernel's measurement
    stream."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.ops.pallas_mega import megakernel_optimize

    dtype = jnp.float32
    n = sp.NSTATE
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), batch))
    G_pair = sp.gram_pair(dtype)
    hh, hl, nh, nl = jax.vmap(sp.factored_statistics)(meas)
    stats = (hh, hl, nh[:, None], nl[:, None])
    mxu, hbm = peaks()
    bytes_solve = 4 * (14 + n + n + n * n + n + 6)

    for bt in block_batches:
        def run(q, s):
            r = megakernel_optimize(sp.factored_products_minor, q, prm,
                                    problem_data=s,
                                    shared_data=G_pair,
                                    block_batch=bt)
            return r.p, r.n_attempts
        try:
            _, n_att = jax.jit(run)(p0s, stats)
            useful = int(np.asarray(n_att).sum())
            dt = measure_loop(lambda q, s: run(q, s), p0s, stats)
        except Exception as e:  # noqa: BLE001 — Mosaic lowering faults
            emit("end_to_end_config3f_megakernel", 0.0, "solves/s",
                 block_batch=bt, error=f"{type(e).__name__}: {e}"[:300])
            continue
        bound_solve = bytes_solve / (hbm * 1e9)
        emit("end_to_end_config3f_megakernel", batch / dt, "solves/s",
             batch=batch, block_batch=bt, useful_attempts=useful,
             measured_ns_per_attempt=round(dt / useful * 1e9, 2),
             hbm_bound_ns_per_solve=round(bound_solve * 1e9, 3),
             sol_frac_hbm=round(bound_solve / (dt / batch), 4),
             bound="HBM one-pass per solve; VPU-compute-bound")


def bench_e2e_loop_overhead_sweep(batches=(512, 2048, 8192, 32768),
                                  layouts=("leading", "minor")):
    """Tests the roofline's residual-gap hypothesis (docs/ROOFLINE.md): if
    the measured ns/attempt stays far above the HBM bound after the
    layout/factored remedies, is the rest per-WAVEFRONT loop overhead
    (while_loop dispatch cost paid once per attempt wavefront, amortized
    over the batch) or per-ELEMENT cost (real memory/compute)?

    Method: run the plain config-3 batched solve (no compaction, so
    wavefronts == max n_attempts) across batch sizes, take per-wavefront
    seconds w(B) = dt / wavefronts, and least-squares fit
    w(B) = overhead + slope * B. 'overhead' is the fixed per-wavefront
    cost (loop dispatch, scalar bookkeeping); 'slope' is the marginal
    per-element-attempt cost, directly comparable to the per-attempt HBM
    bound. If overhead/B >> slope at production batch sizes, the gap is
    loop overhead and the megakernel (whole attempt resident in VMEM) is
    the lever; if slope itself sits above the bound, the carry traffic is
    real and the layout work must continue."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.parallel.batched import batched_optimize
    from libdogleg_tpu.solver import Products

    dtype = jnp.float32
    m, n = sp.NMEAS, sp.NSTATE
    gx, gy = sp.make_grid(dtype)
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)

    def products(p, meas):
        x = sp.model(p, gx, gy) - meas
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x,
                        Jt_x=jnp.matmul(J.T, x,
                                        preferred_element_type=dtype),
                        JtJ=jnp.matmul(J.T, J,
                                       preferred_element_type=dtype))

    # the same per-attempt HBM bound as bench_e2e_roofline_config3
    carry_f32 = 3 * n + 1 + n * n + 3 * (n + 2) + 8
    bytes_att = 2 * 4 * carry_f32 + 4 * m
    mxu, hbm = peaks()
    bound_att_ns = max(bytes_att / (hbm * 1e9),
                       (10 * m + 12 * m + 2 * m * n + 2 * m * n * n
                        + n ** 3 // 3 + 3 * 2 * n * n + 40 * n)
                       / (mxu * 1e12)) * 1e9

    for layout in layouts:
        rows = []
        for batch in batches:
            keys = jax.random.split(jax.random.PRNGKey(0), batch)
            meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
            p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
                jax.random.split(jax.random.PRNGKey(1), batch))

            def run(q, mm):
                r = batched_optimize(products, q, prm, problem_data=mm,
                                     layout=layout)
                return r.p, r.n_attempts

            _, n_att = jax.jit(run)(p0s, meas)
            n_att = np.asarray(n_att)
            wavefronts = int(n_att.max())
            useful = int(n_att.sum())
            dt = measure_loop(lambda q, mm: run(q, mm), p0s, meas)
            rows.append({"batch": batch, "wavefronts": wavefronts,
                         "useful_attempts": useful,
                         "solve_s": round(dt, 6),
                         "wavefront_us": round(dt / wavefronts * 1e6, 3),
                         "ns_per_attempt": round(dt / useful * 1e9, 2)})
        B = np.array([r["batch"] for r in rows], np.float64)
        W = np.array([r["solve_s"] / r["wavefronts"] for r in rows])
        A = np.stack([np.ones_like(B), B], axis=1)
        (overhead, slope), *_ = np.linalg.lstsq(A, W, rcond=None)
        # the marginal per-element-attempt cost includes the wavefront
        # waste of masked-done elements; per USEFUL attempt it scales by
        # (wavefronts * batch) / useful, roughly constant across B
        waste = np.mean([r["wavefronts"] * r["batch"]
                         / r["useful_attempts"] for r in rows])
        emit("e2e_loop_overhead_sweep", overhead * 1e6, "us/wavefront",
             layout=layout, sweep=rows,
             marginal_ns_per_element_attempt=round(slope * 1e9, 3),
             marginal_ns_per_useful_attempt=round(slope * waste * 1e9, 3),
             bound_ns_per_attempt=round(bound_att_ns, 3),
             overhead_share_at_8192=round(
                 float(overhead / (overhead + slope * 8192)), 4),
             bound="fit: wavefront_s = overhead + slope*batch")


def bench_sparse_cholesky(nb=256, b=64, band=3):
    from libdogleg_tpu import sparse_cholesky as sc
    from libdogleg_tpu.native.loader import native_available
    # Warm the one-time on-demand g++ build of the native symbolic
    # library OUTSIDE the timed region: round 4's analyze_ms=3937 was
    # dominated by that once-per-checkout toolchain step (the analysis
    # itself is ~8 ms with the native path, ~300 ms pure-Python).
    native_available()
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
    import sys
    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "backend": jax.default_backend()}))
    if "--lite" in sys.argv:
        # the <=10-minute tier for evidence.py --quick: the calibration
        # anchor, the two factorization rows VERDICT r4 gates on, and
        # the megakernel headline leg
        bench_matmul_calibration()
        bench_dense_cholesky()
        bench_sparse_cholesky()
        bench_e2e_roofline_config3_mega(block_batches=(512,))
    else:
        bench_matmul_calibration()
        bench_small_cholesky()
        bench_jtj_formation()
        bench_dense_cholesky()
        bench_blocked_cholesky()
        bench_sparse_cholesky()
        bench_e2e_roofline_config3()
        bench_e2e_roofline_config3f()
        bench_e2e_roofline_config8()
        bench_e2e_roofline_config3_mega()
        bench_e2e_roofline_config3f_mega()
        bench_e2e_loop_overhead_sweep()
