"""Randomized trace parity: drive the COMPILED reference library through
ctypes callbacks on arbitrary dense problems and diff its vnlog trace
against ours, attempt by attempt.

Where test_reference_parity.py checks the reference's single baked-in demo
problem, this builds libdogleg itself as a shared object, defines random
nonlinear least-squares problems in Python (residuals r = A tanh(B p) + C p
- d with the exact analytic Jacobian), hands the same callback math to both
solvers, and requires identical accept/reject decisions, step types, and
metrics across every attempt — a distributional parity check over the
problem space, not one golden trace.
"""

import ctypes
import os
import pathlib
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from tests.test_reference_parity import (FIELDS, ORACLE_SRC, REF,
                                         assert_traces_match)

BUILD = pathlib.Path(__file__).parent / "_oracle_build"
DENSE_CB = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)


class DoglegParameters2(ctypes.Structure):
    """ctypes mirror of dogleg_parameters2_t (reference dogleg.h:112-152;
    layout pinned by the reference's own _Static_assert at dogleg.h:153)."""
    _fields_ = [
        ("max_iterations", ctypes.c_int),
        ("dogleg_debug", ctypes.c_int),
        ("trustregion0", ctypes.c_double),
        ("trustregion_decrease_factor", ctypes.c_double),
        ("trustregion_decrease_threshold", ctypes.c_double),
        ("trustregion_increase_factor", ctypes.c_double),
        ("trustregion_increase_threshold", ctypes.c_double),
        ("Jt_x_threshold", ctypes.c_double),
        ("update_threshold", ctypes.c_double),
        ("trustregion_threshold", ctypes.c_double),
    ]


DOGLEG_DEBUG_VNLOG = 1 << 30


@pytest.fixture(scope="module")
def libref():
    if not (REF / "dogleg.c").exists() or shutil.which("gcc") is None:
        pytest.skip("reference source or gcc unavailable")
    BUILD.mkdir(exist_ok=True)
    shutil.copy(ORACLE_SRC / "cholmod_stub.h", BUILD / "cholmod.h")
    so = BUILD / "libdogleg_ref.so"
    cmd = ["gcc", "-O2", "-shared", "-fPIC", "-o", str(so),
           str(ORACLE_SRC / "cholmod_stub.c"), str(REF / "dogleg.c"),
           f"-I{BUILD}", f"-I{REF}", "-l:liblapack.so.3", "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        pytest.skip(f"reference library build failed: {e}")
    lib = ctypes.CDLL(str(so))
    lib.dogleg_optimize_dense2.restype = ctypes.c_double
    lib.dogleg_optimize_dense2.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_uint, ctypes.c_uint,
        DENSE_CB, ctypes.c_void_p, ctypes.POINTER(DoglegParameters2),
        ctypes.c_void_p]
    lib.dogleg_getDefaultParameters.restype = None
    lib.dogleg_getDefaultParameters.argtypes = [
        ctypes.POINTER(DoglegParameters2)]
    return lib


def random_problem(seed, nstate, nmeas):
    """r(p) = A tanh(B p) + C p - d, J = A diag(1 - tanh^2(B p)) B + C.
    Returns the fixed data; numpy/jnp closures are built per solver."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(nmeas, nstate))
    B = rng.normal(size=(nstate, nstate)) * 0.5
    C = rng.normal(size=(nmeas, nstate)) * 0.3
    p_true = rng.normal(size=nstate)
    d = A @ np.tanh(B @ p_true) + C @ p_true + rng.normal(size=nmeas) * 0.05
    p0 = rng.normal(size=nstate)
    return A, B, C, d, p0


def np_closures(A, B, C, d):
    def residuals(p):
        return A @ np.tanh(B @ p) + C @ p - d

    def jacobian(p):
        t = np.tanh(B @ p)
        return A @ (((1.0 - t * t)[:, None]) * B) + C

    return residuals, jacobian


def run_reference(lib, residuals, jacobian, p0, nmeas):
    """Solve with the reference, capturing its vnlog stream from fd 1."""
    nstate = p0.shape[0]

    @DENSE_CB
    def cb(p_ptr, x_ptr, J_ptr, cookie):
        p = np.ctypeslib.as_array(p_ptr, (nstate,)).copy()
        x = residuals(p)
        J = jacobian(p)
        np.ctypeslib.as_array(x_ptr, (nmeas,))[:] = x
        np.ctypeslib.as_array(J_ptr, (nmeas, nstate)).reshape(-1)[:] = \
            J.reshape(-1)

    prm = DoglegParameters2()
    lib.dogleg_getDefaultParameters(ctypes.byref(prm))
    prm.dogleg_debug = DOGLEG_DEBUG_VNLOG

    p = np.ascontiguousarray(p0, np.float64).copy()
    p_c = p.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    # capture the C side's stdout (vnlog goes to fd 1, flushed per record)
    with tempfile.TemporaryFile() as tmp:
        saved = os.dup(1)
        os.dup2(tmp.fileno(), 1)
        try:
            norm2x = lib.dogleg_optimize_dense2(
                p_c, nstate, nmeas, cb, None, ctypes.byref(prm), None)
        finally:
            os.dup2(saved, 1)
            os.close(saved)
        tmp.seek(0)
        text = tmp.read().decode()
    rows = [l.split() for l in text.splitlines()
            if l.strip() and not l.startswith("#")]
    return rows, p, float(norm2x)


def run_ours(A, B, C, d, p0):
    import jax
    import jax.numpy as jnp

    from libdogleg_tpu import DenseProblem, DoglegParameters, optimize
    from libdogleg_tpu.diagnostics import format_vnlog

    Aj, Bj, Cj, dj = map(jnp.asarray, (A, B, C, d))

    def f(p):
        t = jnp.tanh(Bj @ p)
        x = Aj @ t + Cj @ p - dj
        J = Aj @ (((1.0 - t * t)[:, None]) * Bj) + Cj
        return x, J

    r = jax.jit(lambda q: optimize(DenseProblem(f=f), q, DoglegParameters(),
                                   record_history=True))(jnp.asarray(p0))
    text = format_vnlog(r.history, r.n_attempts)
    rows = [l.split() for l in text.splitlines()[1:] if l.strip()]
    return rows, r


@pytest.mark.parametrize("seed,nstate,nmeas", [
    (0, 4, 24), (1, 6, 40), (2, 8, 16), (3, 3, 60), (4, 10, 30),
    (5, 5, 12), (6, 7, 50),
])
def test_random_dense_trace_parity(libref, seed, nstate, nmeas):
    A, B, C, d, p0 = random_problem(seed, nstate, nmeas)
    residuals, jacobian = np_closures(A, B, C, d)
    ref_rows, p_ref, norm2_ref = run_reference(libref, residuals, jacobian,
                                               p0, nmeas)
    our_rows, result = run_ours(A, B, C, d, p0)
    assert_traces_match(ref_rows, our_rows, rel=1e-4)
    assert norm2_ref >= 0
    np.testing.assert_allclose(np.asarray(result.p), p_ref,
                               rtol=1e-5, atol=1e-7)
