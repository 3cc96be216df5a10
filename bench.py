"""Headline benchmark: batched dog-leg solves/s on one TPU chip.

BASELINE.md config 3: many independent small trust-region problems (the
reference sample.c problem: 6 states, 100 measurements, distinct noise per
instance) vmapped into one program per chip. The baseline target is 1e4
batched solves/s (BASELINE.json north star, stated for a v5p-8 host); this
runs on however many chips are visible (typically one) and reports
vs_baseline against the 1e4 target.

Timing uses utils.benchtime.measure_loop: serially-dependent in-jit
repetitions ended by a dependent host fetch, differenced across two rep
counts. On this environment's tunneled TPU backend, block_until_ready is
NOT a completion barrier and unfetched dispatches can be elided, so naive
wall-clock timing measures dispatch, not compute.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N/1e4}
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

import libdogleg_tpu.sample_problem as sp
from libdogleg_tpu import DoglegParameters
from libdogleg_tpu.solver import Products
from libdogleg_tpu.utils.benchtime import measure_loop

BATCH = 8192
BASELINE_SOLVES_PER_S = 1.0e4


def _backend_watchdog(seconds=240):
    """Abort with an error JSON line if backend init hangs. The tunneled
    TPU's client retries a dead tunnel in an unbounded sleep loop inside
    C code (observed: hours) — a signal-based alarm can't preempt that
    (Python handlers only run between bytecodes), so a daemon thread
    with os._exit does. Returns an Event to set once init succeeded."""
    import os
    import threading

    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            print(json.dumps({"metric": "batched_dogleg_solves_per_s",
                              "value": 0.0, "unit": "solves/s",
                              "vs_baseline": 0.0,
                              "error": f"backend init timed out"
                                       f" ({seconds}s); TPU tunnel"
                                       " unavailable"}))
            sys.stdout.flush()
            os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main():
    dtype = jnp.float32  # TPU-native precision; f64 is CPU-parity mode
    ready = _backend_watchdog()
    jax.devices()        # force backend init under the watchdog
    ready.set()
    gx, gy = sp.make_grid(dtype)

    # f32-appropriate thresholds (the reference's 1e-8 C-double thresholds
    # sit below f32 resolution for this problem's gradient scale).
    prm = DoglegParameters(max_iterations=10,
                           Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)

    def products(p, meas):
        x = sp.model(p, gx, gy) - meas
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x,
                        Jt_x=jnp.matmul(J.T, x, preferred_element_type=dtype),
                        JtJ=jnp.matmul(J.T, J, preferred_element_type=dtype))

    # straggler compaction (parallel.batched_optimize_compacted semantics):
    # the vmapped while_loop pays for the slowest element (max 15 attempts
    # vs mean 8.5 here); finish the tail in a BATCH/16 compacted buffer.
    # Exact — a final full-batch pass covers any capacity miss.
    from libdogleg_tpu.parallel.batched import batched_optimize_compacted

    def solver_for(layout):
        def solve_one_batch(p0s, meas_batch):
            # auto-tuned defaults: adaptive phase 1 + batch/16 capacity
            # (recovers the hand-tuned phase1_attempts=11 headline, see
            # README); layout self-selected below (docs/ROOFLINE.md)
            r = batched_optimize_compacted(products, p0s, prm,
                                           problem_data=meas_batch,
                                           layout=layout)
            return r.p, r.step_count.astype(jnp.float32)
        return solve_one_batch

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    meas_batch = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), BATCH))

    def solver_mega(block_batch):
        from libdogleg_tpu.ops.pallas_mega import megakernel_optimize

        def solve_one_batch(p0s, meas_batch):
            r = megakernel_optimize(
                sp.products_minor, p0s, prm,
                problem_data=(meas_batch,),
                shared_data=(gx[:, None], gy[:, None]),
                block_batch=block_batch)
            return r.p, r.step_count.astype(jnp.float32)
        return solve_one_batch

    # sufficient-statistics reformulation (docs/ROOFLINE.md remedy 2,
    # config 3f): J never materializes and the measurement stream is
    # replaced by 14 f32 of per-instance statistics. Solves the SAME
    # problem instances; the correctness gate below applies unchanged.
    G_pair = sp.gram_pair(dtype)

    def solver_factored(layout):
        def solve_one_batch(p0s, meas_batch):
            stats = jax.vmap(sp.factored_statistics)(meas_batch)
            r = batched_optimize_compacted(
                lambda p, st: sp.factored_products(p, st, G_pair),
                p0s, prm, problem_data=stats, layout=layout)
            return r.p, r.step_count.astype(jnp.float32)
        return solve_one_batch

    # Warmup / compile + correctness gate ON THE TIMED PROGRAMS: a
    # regression in the compaction path must fail the gate, not just a
    # separate CPU test (advisor round-1 finding). Contenders: both
    # carry layouts of the XLA compacted path, plus the whole-solve
    # Pallas megakernel (ops/pallas_mega.py) — the reported headline is
    # the fastest gate-passing program. The megakernel leg is
    # best-effort: a Mosaic lowering failure skips it with a note
    # instead of zeroing the headline.
    contenders = [("leading", solver_for("leading"), True),
                  ("minor", solver_for("minor"), True),
                  ("factored-leading", solver_factored("leading"), True),
                  ("factored-minor", solver_factored("minor"), True),
                  ("mega-256", solver_mega(256), False),
                  ("mega-1024", solver_mega(1024), False)]
    best = None
    for name, solve_one_batch, required in contenders:
        try:
            p_sol, steps = jax.block_until_ready(
                solve_one_batch(p0s, meas_batch))
        except Exception as e:  # noqa: BLE001 — Mosaic lowering faults
            if required:
                raise
            print(f"# contender {name} failed to run "
                  f"({type(e).__name__}: {e}); skipped", file=sys.stderr)
            continue
        err = np.abs(np.asarray(p_sol) - sp.P_TRUE[None, :])
        frac_ok = float(np.mean(np.all(err < 0.2, axis=1)))
        if frac_ok < 0.99:
            if not required:
                print(f"# contender {name} failed the correctness gate "
                      f"({frac_ok:.3f}); skipped", file=sys.stderr)
                continue
            print(json.dumps({"metric": "batched_dogleg_solves_per_s",
                              "value": 0.0, "unit": "solves/s",
                              "vs_baseline": 0.0,
                              "error": f"correctness gate failed"
                                       f" ({name}): {frac_ok:.3f}"}))
            sys.exit(1)
        dt_l = measure_loop(lambda q, m: solve_one_batch(q, m),
                            p0s, meas_batch)
        print(f"# program={name} dt={dt_l*1e3:.1f}ms", file=sys.stderr)
        if best is None or dt_l < best[0]:
            best = (dt_l, name, steps, frac_ok)
    dt, chosen_layout, steps, frac_ok = best

    solves_per_s = BATCH / dt
    print(json.dumps({
        "metric": "batched_dogleg_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 4),
    }))
    print(f"# devices={jax.device_count()} backend={jax.default_backend()} "
          f"batch={BATCH} dt_per_batch={dt*1e3:.1f}ms "
          f"layout={chosen_layout} "
          f"mean_steps={float(np.mean(np.asarray(steps))):.2f} "
          f"recovered={frac_ok:.4f}", file=sys.stderr)


if __name__ == "__main__":
    import os
    import subprocess
    try:
        main()
    except Exception as e:  # noqa: BLE001 — transient tunneled-TPU faults
        if os.environ.get("BENCH_RETRIED") == "1":
            raise
        # a TPU-worker crash poisons this process's backend; retry once in
        # a fresh process so a transient fault doesn't zero the benchmark
        print(f"# bench attempt failed ({type(e).__name__}: {e}); "
              "retrying in a fresh process", file=sys.stderr)
        env = dict(os.environ, BENCH_RETRIED="1")
        sys.exit(subprocess.call([sys.executable, __file__], env=env))
