"""Diagnostics: the vnlog per-iteration metrics stream.

The reference emits two diagnostic streams selected by debug bits (reference
dogleg.h:221-227): a human stream to stderr and a machine-parseable vnlog
table to stdout with one row per step attempt and 14 metric fields generated
by X-macros (reference dogleg.c:42-113). Here the solver records the same
schema into a fixed-size History buffer inside the jitted loop
(solver.History), and this module renders it as vnlog text — byte-compatible
field names and '-' placeholders — plus a human summary. Diffable against the
reference's `sample --diag vnlog` output for decision-by-decision trace
comparison (SURVEY.md section 7, hard part 4).
"""

from __future__ import annotations

import io
import math
from typing import Optional

import numpy as np

from libdogleg_tpu.solver import History, SolveResult, StepType, StopReason

# Field order matches the reference exactly (dogleg.c:50-64).
_FIELDS = (
    "norm2x_before", "norm2x_after", "step_len_cauchy",
    "step_len_gauss_newton", "step_len_interpolated", "k_cauchy_to_gn",
    "step_len", "step_type", "step_direction_change_deg",
    "expected_improvement", "observed_improvement", "rho",
    "trustregion_before", "trustregion_after",
)

_STEP_TYPE_NAMES = {
    int(StepType.CAUCHY): "cauchy",
    int(StepType.GAUSSNEWTON): "gaussnewton",
    int(StepType.INTERPOLATED): "interpolated",
    int(StepType.FAILED): "failed",
}


def vnlog_legend() -> str:
    """The header row (reference vnlog_debug_emit_legend, dogleg.c:75-81)."""
    return "# iteration step_accepted " + " ".join(_FIELDS)


def _fmt(v) -> str:
    # The reference prints '-' for unset (INFINITY) fields (dogleg.c:83-87)
    # and %g otherwise.
    f = float(v)
    if math.isinf(f):
        return "-"
    return f"{f:g}"


def format_vnlog(history: History, n_attempts: Optional[int] = None) -> str:
    """Render a recorded History as a vnlog table (one row per attempt)."""
    out = io.StringIO()
    print(vnlog_legend(), file=out)
    n = (int(n_attempts) if n_attempts is not None
         else int(np.sum(np.asarray(history.iteration) >= 0)))
    n = min(n, len(np.asarray(history.iteration)))
    h = {k: np.asarray(getattr(history, k)) for k in History._fields}
    for i in range(n):
        row = [str(int(h["iteration"][i])), str(int(h["step_accepted"][i]))]
        for name in _FIELDS:
            if name == "step_type":
                row.append(_STEP_TYPE_NAMES.get(int(h[name][i]), "-"))
            else:
                row.append(_fmt(h[name][i]))
        print(" ".join(row), file=out)
    return out.getvalue()


def print_vnlog(result: SolveResult) -> None:
    """Print the solve's vnlog stream (requires record_history=True)."""
    if result.history is None:
        raise ValueError("solve was run without record_history=True")
    print(format_vnlog(result.history, result.n_attempts), end="")


def explain_result(result: SolveResult) -> str:
    """Human-oriented one-line summary (the reference scatters this through
    stderr via SAY_IF_VERBOSE; here it is a single structured line)."""
    reason = StopReason(int(result.reason)).name
    return (f"dogleg: {int(result.step_count)} accepted steps "
            f"({int(result.n_attempts)} attempts), stop={reason}, "
            f"norm2_x={float(result.norm2_x):.6g}, "
            f"trustregion={float(result.trustregion):.6g}, "
            f"lambda={float(result.lam):.3g}")


def profile_op_summary(fn, *args, logdir: str = "/tmp/libdogleg_tpu_trace",
                       top: int = 15) -> str:
    """Profile one execution of fn(*args) with jax.profiler and return a
    per-op device-time summary (the reference has no profiling at all,
    SURVEY.md section 5.1; on TPU this is the tool that shows where a
    solve's wall time actually goes — e.g. the while-loop body's fusions).

    The result is forced to completion with a dependent host fetch, which
    is required for a truthful trace on asynchronous remote backends."""
    import collections
    import glob
    import gzip
    import json

    import jax

    from libdogleg_tpu.utils.benchtime import fetch

    fetch(fn(*args))                      # compile outside the trace
    with jax.profiler.trace(logdir):
        fetch(fn(*args))

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return "no trace captured"
    data = json.loads(gzip.open(files[-1]).read())
    all_events = data.get("traceEvents", [])
    events = [e for e in all_events
              if e.get("ph") == "X" and e.get("dur")]
    procs = {e["pid"]: str(e["args"].get("name"))
             for e in all_events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = [p for p, nm in procs.items()
                if "TPU" in nm or "GPU" in nm or "XLA" in nm]
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in events:
        if not dev_pids or e["pid"] in dev_pids:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    lines = [f"{'ms':>9}  {'calls':>6}  op"]
    for name, dur in sorted(agg.items(), key=lambda t: -t[1])[:top]:
        lines.append(f"{dur / 1e3:9.3f}  {cnt[name]:6d}  {name[:80]}")
    return "\n".join(lines)
