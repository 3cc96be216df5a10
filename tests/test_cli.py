"""CLI smoke: the sample demo (reference sample.c's interface) stays
runnable end to end — `--check` asserts convergence and 5e-2 recovery
internally (reference sample.c:424-457), so a zero exit is the assertion."""

import subprocess
import sys

import pytest


@pytest.mark.parametrize("mode", ["dense", "residual"])
def test_sample_cli_check(mode):
    # f64: the --check recovery bound assumes the reference's double
    # precision (f32 stalls at its gradient noise floor near the bound)
    out = subprocess.run(
        [sys.executable, "-m", "libdogleg_tpu.sample", "--check",
         "--platform", "cpu", mode],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr


def test_sample_cli_vnlog_stream():
    out = subprocess.run(
        [sys.executable, "-m", "libdogleg_tpu.sample", "--diag", "vnlog",
         "--platform", "cpu", "dense"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert lines[0].startswith("# iteration step_accepted norm2x_before")
    assert len(lines) > 2  # at least a couple of attempt rows
