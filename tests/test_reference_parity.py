"""Decision-by-decision trace parity against the COMPILED C reference.

The gold-standard parity check (SURVEY.md section 7, hard part 4): compile
the actual reference — ALL paths, including sparse: SuiteSparse is absent
on this machine, so the functional minichol backend
(tests/reference_oracle/minichol.{h,c}) stands in for the CHOLMOD API
subset dogleg.c uses — feed both implementations the bit-identical problem
(the reference's own glibc random() stream, reproduced via ctypes), and
diff the per-attempt vnlog traces: every accept/reject decision, step
type, and metric must match.

Known reference quirk handled here: the step_direction_change_deg field is
dead in the reference — computeCallbackOperatingPoint clears ALL validity
bits including have_step_to_here (dogleg.c:1012) right after takeStepFrom
sets it (dogleg.c:1400), so the diagnostic never fires and always prints
'-'. This implementation computes it as documented; the field is excluded
from the diff.
"""

import ctypes
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")
ORACLE_SRC = pathlib.Path(__file__).parent / "reference_oracle"
BUILD = pathlib.Path(__file__).parent / "_oracle_build"

RAND_MAX = 2147483647
NSTATE, NMEAS = 6, 100
FIELDS = ("norm2x_before", "norm2x_after", "step_len_cauchy",
          "step_len_gauss_newton", "step_len_interpolated", "k_cauchy_to_gn",
          "step_len", "step_type", "step_direction_change_deg",
          "expected_improvement", "observed_improvement", "rho",
          "trustregion_before", "trustregion_after")


@pytest.fixture(scope="module")
def oracle():
    if not (REF / "dogleg.c").exists() or shutil.which("gcc") is None:
        pytest.skip("reference source or gcc unavailable")
    BUILD.mkdir(exist_ok=True)
    shutil.copy(ORACLE_SRC / "minichol.h", BUILD / "cholmod.h")
    exe = BUILD / "sample_ref"
    cmd = ["gcc", "-O2", "-o", str(exe),
           str(ORACLE_SRC / "minichol.c"),
           str(REF / "dogleg.c"), str(REF / "sample.c"),
           f"-I{BUILD}", f"-I{REF}", "-l:liblapack.so.3", "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        pytest.skip(f"reference oracle build failed: {e}")
    return exe


def glibc_problem():
    """Reproduce sample.c's exact measurements and initial state: glibc
    srandom(0), 100 noise draws (sample.c:46-62), then 6 initial-state draws
    (sample.c:366-372)."""
    libc = ctypes.CDLL("libc.so.6")
    libc.srandom(0)
    noise = np.array([libc.random() / RAND_MAX - 0.5
                      for _ in range(NMEAS)])
    p0 = np.array([libc.random() / RAND_MAX - 0.1 for _ in range(NSTATE)])
    return noise, p0


def run_oracle_vnlog(exe, mode):
    out = subprocess.run([str(exe), "--diag", "vnlog", mode],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    rows = []
    for line in out.stdout.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        rows.append(line.split())
    return rows


def our_vnlog_rows(mode):
    import jax
    import jax.numpy as jnp

    import libdogleg_tpu.models.quadratic_surface as qs
    from libdogleg_tpu import DoglegParameters, optimize
    from libdogleg_tpu.diagnostics import format_vnlog
    from libdogleg_tpu.solver import solve_products

    noise, p0 = glibc_problem()
    gx, gy = qs.make_grid(jnp.float64)
    meas = qs.model(jnp.asarray(qs.P_TRUE), gx, gy) + jnp.asarray(noise)
    prm = DoglegParameters(max_iterations=8)
    if mode == "sharded":
        # the measurement-sharded path on the 8-virtual-device mesh: the
        # row-block psum of (norm2x, Jt_x, JtJ) must take the SAME
        # decisions as the reference's single-threaded C
        from libdogleg_tpu.parallel import (MeasurementShardedProblem,
                                            make_mesh)
        mesh = make_mesh(("meas",), shape=(4,))

        def f_shard(p, data):
            gx_s, gy_s, m_s = data
            return (qs.model(p, gx_s, gy_s) - m_s,
                    qs.jacobian(p, gx_s, gy_s))

        sharded = MeasurementShardedProblem(
            f=f_shard, data=(gx, gy, meas), mesh=mesh, axis_name="meas")
        r = jax.jit(lambda q: solve_products(
            sharded.products, q, prm,
            record_history=True))(jnp.asarray(p0))
    else:
        problem = {"dense": qs.make_dense_problem,
                   "sparse": qs.make_sparse_problem,
                   "residual": qs.make_residual_problem,
                   "products": qs.make_products_problem}[mode](meas)
        r = jax.jit(lambda q: optimize(problem, q, prm,
                                       record_history=True))(jnp.asarray(p0))
    text = format_vnlog(r.history, r.n_attempts)
    rows = [l.split() for l in text.splitlines()[1:] if l.strip()]
    return rows, r


@pytest.mark.parametrize("ref_mode,our_mode", [
    ("dense", "dense"),
    ("dense-products-unpacked", "products"),
    # the reference's REAL sparse path (dogleg_optimize2 through the
    # functional minichol CHOLMOD subset) vs our block-CSR products path:
    ("sparse", "sparse"),
    # modes with no reference counterpart, diffed against the reference's
    # dense trace (same problem, same math):
    ("dense", "residual"),    # autodiff-Jacobian path
    ("dense", "sharded"),     # measurement-sharded psum path, 4-device mesh
])
def test_vnlog_trace_parity(oracle, ref_mode, our_mode):
    """Every attempt in the solve takes the same decision with the same
    numbers as the compiled C reference."""
    ref_rows = run_oracle_vnlog(oracle, ref_mode)
    our_rows, result = our_vnlog_rows(our_mode)
    assert_traces_match(ref_rows, our_rows)


def assert_traces_match(ref_rows, our_rows, rel=2e-5):
    assert len(ref_rows) == len(our_rows), (
        f"attempt counts differ: ref {len(ref_rows)} vs ours "
        f"{len(our_rows)}")
    skip = {"step_direction_change_deg"}  # dead in the reference (see top)
    for n, (ref, ours) in enumerate(zip(ref_rows, our_rows)):
        assert len(ref) == len(ours) == 2 + len(FIELDS)
        # iteration + accepted: exact
        assert ref[0] == ours[0], f"row {n}: iteration"
        assert ref[1] == ours[1], f"row {n}: step_accepted"
        vals = dict(zip(FIELDS, ref[2:]))
        norm2x = float(vals["norm2x_before"])
        obs = vals["observed_improvement"]
        obs = abs(float(obs)) if obs != "-" else 0.0
        for k, name in enumerate(FIELDS):
            if name in skip:
                continue
            a, b = ref[2 + k], ours[2 + k]
            if name == "step_type":
                assert a == b, f"row {n}: step_type {a} vs {b}"
                continue
            if a == "-" or b == "-":
                assert a == b, f"row {n}: {name} set-ness {a} vs {b}"
                continue
            fa, fb = float(a), float(b)
            # observed_improvement is a difference of two norm2x values,
            # each accurate to ~rel of norm2x: near convergence the
            # cancellation amplifies ulp-level libm differences, so those
            # two fields get a tolerance scaled by the cancellation factor
            # (decisions are still required to match exactly above).
            eff_rel = rel
            if name == "observed_improvement" and obs > 0:
                eff_rel = rel * max(1.0, 4.0 * norm2x / obs)
            elif name == "rho" and obs > 0:
                eff_rel = rel * max(1.0, 4.0 * norm2x / obs)
            assert fa == pytest.approx(fb, rel=eff_rel, abs=1e-11), (
                f"row {n}: {name} {a} vs {b}")


def test_converged_state_parity(oracle):
    """The final state matches the reference's --check run (which asserts
    5e-2 recovery); we additionally require agreement with OUR converged
    state to 1e-6 — far tighter than the termination tolerance."""
    out = subprocess.run([str(oracle), "dense"], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0
    # parse "  p[i] = value" lines from stderr
    import re
    vals = re.findall(r"p\[(\d)\] = ([-\d.]+)", out.stderr)
    p_ref = np.zeros(NSTATE)
    for i, v in vals[-NSTATE:]:
        p_ref[int(i)] = float(v)
    _, result = our_vnlog_rows("dense")
    np.testing.assert_allclose(np.asarray(result.p), p_ref, atol=2e-6)
