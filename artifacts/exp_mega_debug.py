"""Bisect the megakernel Mosaic compile failure on the real chip.

BENCH_KERNELS_r04.json: every megakernel leg failed with
`MosaicError: INTERNAL: remote_compile HTTP 500: tpu_compile_helper
subprocess exit code 1` (error text truncated to 300 chars by the bench
row). Other Pallas kernels (ops/pallas_blockchol.py) compiled on this
same tunnel in round 2, so the failure is either kernel-specific or a
changed compile-helper environment. This script compiles a ladder of
kernels of increasing similarity to ops/pallas_mega.py and prints the
FULL traceback of the first failure, pinning the feature that breaks.

Run on the chip:  python exp_mega_debug.py [--stage N]
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 256
N = 6


def vmem_spec(shape_prefix):
    nd = len(shape_prefix)
    return pl.BlockSpec(tuple(shape_prefix) + (BT,),
                        lambda i, _nd=nd: (0,) * _nd + (i,),
                        memory_space=pltpu.VMEM)


def run(kernel, n_out_rows=1, extra_in=()):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, BT)).astype(np.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[vmem_spec((N,))] + [vmem_spec(s.shape[:-1])
                                      for s in extra_in],
        out_specs=vmem_spec((n_out_rows,)),
        out_shape=jax.ShapeDtypeStruct((n_out_rows, BT), jnp.float32),
    )(x, *extra_in)
    return jax.block_until_ready(outs)


def stage0_copy():
    """Trivial: copy one row."""
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[0:1] * 2.0
    run(kernel)


def stage1_while_scalar():
    """while_loop with a (1, bt) f32 carry and a global-min cond."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def cond(c):
            v, i = c
            return (i < 10) & (jnp.min(v) < 100.0)

        def body(c):
            v, i = c
            return v + jnp.sum(x * x, axis=0, keepdims=True), i + 1

        v, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros_like(x[0:1]),
                         jnp.asarray(0, jnp.int32)))
        o_ref[:] = v
    run(kernel)


def stage2_while_3d_carry():
    """while_loop carrying a 3-D (n, n, bt) array."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        A0 = x[None, :, :] * x[:, None, :]

        def cond(c):
            A, i = c
            return i < 5

        def body(c):
            A, i = c
            return A + A0, i + 1

        A, _ = jax.lax.while_loop(
            cond, body, (A0, jnp.asarray(0, jnp.int32)))
        o_ref[:] = jnp.sum(A, axis=(0, 1))[None]
    run(kernel)


def stage3_nested_while():
    """Nested while_loop (the lambda-escalation shape)."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def inner(v):
            def cond(c):
                u, i = c
                return (i < 3) & (jnp.max(u) > 1e-30)

            def body(c):
                u, i = c
                return u * 0.5, i + 1

            u, _ = jax.lax.while_loop(
                cond, body, (v, jnp.asarray(0, jnp.int32)))
            return u

        def cond(c):
            v, i = c
            return i < 4

        def body(c):
            v, i = c
            return inner(v + jnp.sum(x, axis=0, keepdims=True)), i + 1

        v, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros_like(x[0:1]),
                         jnp.asarray(0, jnp.int32)))
        o_ref[:] = v
    run(kernel)


def stage4_chol_once():
    """The unrolled minor-layout Cholesky + solve, no loops."""
    from libdogleg_tpu.ops.pallas_mega import _chol_minor, _cho_solve_minor

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        ri = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        eye = (ri == ci).astype(x.dtype)
        A = x[None, :, :] * x[:, None, :] + 4.0 * eye
        L, ok = _chol_minor(A)
        s = _cho_solve_minor(L, x)
        o_ref[:] = jnp.sum(s, axis=0, keepdims=True) + ok
    run(kernel)


def stage5_full_mega_tiny():
    """The real megakernel on a tiny factored problem."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.ops.pallas_mega import megakernel_optimize

    dtype = jnp.float32
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)
    B = BT
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), B))
    G_pair = sp.gram_pair(dtype)
    hh, hl, nh, nl = jax.vmap(sp.factored_statistics)(meas)
    r = megakernel_optimize(sp.factored_products_minor, p0s, prm,
                            problem_data=(hh, hl, nh[:, None],
                                          nl[:, None]),
                            shared_data=G_pair, block_batch=BT)
    jax.block_until_ready(r.p)
    err = np.abs(np.asarray(r.p) - sp.P_TRUE[None, :])
    print(f"  recovered frac: "
          f"{float(np.mean(np.all(err < 0.2, axis=1))):.3f}")


def stage6_full_mega_general():
    """The real megakernel on the general products (J in-kernel)."""
    import libdogleg_tpu.models.quadratic_surface as sp
    from libdogleg_tpu import DoglegParameters
    from libdogleg_tpu.ops.pallas_mega import megakernel_optimize

    dtype = jnp.float32
    gx, gy = sp.make_grid(dtype)
    prm = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                           update_threshold=1e-5,
                           trustregion_threshold=1e-5)
    B = BT
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=dtype))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=dtype))(
        jax.random.split(jax.random.PRNGKey(1), B))
    r = megakernel_optimize(sp.products_minor, p0s, prm,
                            problem_data=(meas,),
                            shared_data=(gx[:, None], gy[:, None]),
                            block_batch=BT)
    jax.block_until_ready(r.p)
    err = np.abs(np.asarray(r.p) - sp.P_TRUE[None, :])
    print(f"  recovered frac: "
          f"{float(np.mean(np.all(err < 0.2, axis=1))):.3f}")


STAGES = [stage0_copy, stage1_while_scalar, stage2_while_3d_carry,
          stage3_nested_while, stage4_chol_once, stage5_full_mega_tiny,
          stage6_full_mega_general]


def main():
    only = None
    if "--stage" in sys.argv:
        only = int(sys.argv[sys.argv.index("--stage") + 1])
    print(f"devices: {jax.devices()}")
    for i, fn in enumerate(STAGES):
        if only is not None and i != only:
            continue
        print(f"stage {i}: {fn.__name__} ... ", flush=True)
        try:
            fn()
            print(f"stage {i}: OK", flush=True)
        except Exception:
            print(f"stage {i}: FAILED", flush=True)
            traceback.print_exc()
            if only is None:
                break


if __name__ == "__main__":
    main()
