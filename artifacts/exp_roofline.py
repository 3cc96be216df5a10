"""Scratch: config-3 roofline gap diagnosis on the TPU.

Steps: (1) measure the headline program + the factored variant; (2) dump
XLA's own cost/memory analysis for the compiled batched solve to see
which buffers are materialized (J? padded carries?); (3) A/B a
batch-minor layout of the same program.

Run on the axon TPU. Not part of the suite; findings get written into
bench_kernels/ops docstrings and deleted or kept as a record.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

import libdogleg_tpu.models.quadratic_surface as sp
from libdogleg_tpu import DoglegParameters
from libdogleg_tpu.parallel.batched import (batched_optimize,
                                            batched_optimize_compacted)
from libdogleg_tpu.solver import Products
from libdogleg_tpu.utils.benchtime import measure_loop

BATCH = int(__import__("os").environ.get("EXP_BATCH", "8192"))
DTYPE = jnp.float32
PRM = DoglegParameters(max_iterations=10, Jt_x_threshold=1e-3,
                       update_threshold=1e-5, trustregion_threshold=1e-5)


def make_inputs():
    gx, gy = sp.make_grid(DTYPE)
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=DTYPE))(keys)
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(1), BATCH))

    def products(p, m):
        x = sp.model(p, gx, gy) - m
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x,
                        Jt_x=jnp.matmul(J.T, x,
                                        preferred_element_type=DTYPE),
                        JtJ=jnp.matmul(J.T, J,
                                       preferred_element_type=DTYPE))
    return products, p0s, meas


def headline():
    products, p0s, meas = make_inputs()

    def run(q, m):
        r = batched_optimize_compacted(products, q, PRM, problem_data=m)
        return r.p, r.n_attempts

    f = jax.jit(run)
    _, na = f(p0s, meas)
    useful = int(np.sum(np.asarray(na)))
    dt = measure_loop(lambda q, m: run(q, m), p0s, meas)
    print(json.dumps({"exp": "headline", "solves_per_s": BATCH / dt,
                      "useful_attempts": useful,
                      "ns_per_attempt": dt / useful * 1e9}))
    # XLA's own accounting for the compiled program
    lowered = jax.jit(run).lower(p0s, meas)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    keep = {k: v for k, v in sorted(ca.items())
            if k in ("flops", "bytes accessed", "transcendentals")
            or k.startswith("bytes accessed")}
    print(json.dumps({"exp": "cost_analysis", **keep}))
    try:
        ma = comp.memory_analysis()
        print(json.dumps({"exp": "memory_analysis",
                          "temp_MB": ma.temp_size_in_bytes / 1e6,
                          "arg_MB": ma.argument_size_in_bytes / 1e6,
                          "out_MB": ma.output_size_in_bytes / 1e6}))
    except Exception as e:  # noqa: BLE001
        print("# memory_analysis unavailable:", e)


def plain_uncompacted():
    products, p0s, meas = make_inputs()

    def run(q, m):
        r = batched_optimize(products, q, PRM, problem_data=m)
        return r.p, r.n_attempts

    f = jax.jit(run)
    _, na = f(p0s, meas)
    dt = measure_loop(lambda q, m: run(q, m), p0s, meas)
    print(json.dumps({"exp": "plain", "solves_per_s": BATCH / dt,
                      "useful_attempts": int(np.sum(np.asarray(na)))}))


def batch_minor():
    """Same solve vmapped over the LAST axis: all carry tensors get the
    batch as their minor dim, so (6,6)-shaped carries tile as (6, 8k+)
    instead of (B, 8, 128) — 28x less padded HBM traffic if padding is
    the bottleneck."""
    from libdogleg_tpu.solver import solve_products
    products, p0s, meas = make_inputs()
    p0sT, measT = p0s.T, meas.T   # (n, B), (m, B)

    def solve_one(q, m):
        return batched_like_single(q, m)

    def batched_like_single(q, m):
        r = solve_products(lambda p: products(p, m), q, PRM)
        return r.p, r.n_attempts

    run = jax.vmap(batched_like_single, in_axes=(-1, -1), out_axes=-1)
    f = jax.jit(run)
    _, na = f(p0sT, measT)
    useful = int(np.sum(np.asarray(na)))
    dt = measure_loop(lambda q, m: run(q, m), p0sT, measT)
    print(json.dumps({"exp": "batch_minor", "solves_per_s": BATCH / dt,
                      "useful_attempts": useful,
                      "ns_per_attempt": dt / useful * 1e9}))


def headline_minor():
    products, p0s, meas = make_inputs()

    def run(q, m):
        r = batched_optimize_compacted(products, q, PRM, problem_data=m,
                                       layout="minor")
        return r.p, r.n_attempts

    f = jax.jit(run)
    _, na = f(p0s, meas)
    useful = int(np.sum(np.asarray(na)))
    dt = measure_loop(lambda q, m: run(q, m), p0s, meas)
    print(json.dumps({"exp": "headline_minor", "solves_per_s": BATCH / dt,
                      "useful_attempts": useful,
                      "ns_per_attempt": dt / useful * 1e9}))


def factored_minor():
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(1), BATCH))
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(0), BATCH))
    G_pair = sp.gram_pair(DTYPE)
    stats = jax.vmap(sp.factored_statistics)(meas)

    def run(q, s):
        r = batched_optimize_compacted(
            lambda p, st: sp.factored_products(p, st, G_pair), q, PRM,
            problem_data=s, layout="minor")
        return r.p, r.n_attempts

    f = jax.jit(run)
    _, na = f(p0s, stats)
    useful = int(np.sum(np.asarray(na)))
    dt = measure_loop(lambda q, s: run(q, s), p0s, stats)
    print(json.dumps({"exp": "factored_minor", "solves_per_s": BATCH / dt,
                      "useful_attempts": useful,
                      "ns_per_attempt": dt / useful * 1e9}))


def factored():
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(1), BATCH))
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(0), BATCH))
    G_pair = sp.gram_pair(DTYPE)
    stats = jax.vmap(sp.factored_statistics)(meas)

    def run(q, s):
        r = batched_optimize_compacted(
            lambda p, st: sp.factored_products(p, st, G_pair), q, PRM,
            problem_data=s)
        return r.p, r.n_attempts

    f = jax.jit(run)
    _, na = f(p0s, stats)
    useful = int(np.sum(np.asarray(na)))
    dt = measure_loop(lambda q, s: run(q, s), p0s, stats)
    print(json.dumps({"exp": "factored", "solves_per_s": BATCH / dt,
                      "useful_attempts": useful,
                      "ns_per_attempt": dt / useful * 1e9}))


def unroll_sweep():
    """wavefront_unroll A/B: does composing k attempts per while_loop
    wavefront amortize the carry HBM round-trip (XLA fusing across the
    chained bodies), or do the inner control-flow boundaries
    (lambda-escalation while, lazy-GN cond) force the carry to
    materialize between attempts anyway? Runs the factored program
    (fewest non-carry bytes, so any carry amortization shows largest)
    and the general one, k in {1, 2, 4}."""
    p0s = jax.vmap(lambda k: sp.initial_state(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(1), BATCH))
    meas = jax.vmap(lambda k: sp.simulate(k, dtype=DTYPE))(
        jax.random.split(jax.random.PRNGKey(0), BATCH))
    G_pair = sp.gram_pair(DTYPE)
    stats = jax.vmap(sp.factored_statistics)(meas)
    gx, gy = sp.make_grid(DTYPE)

    def products(p, m):
        x = sp.model(p, gx, gy) - m
        J = sp.jacobian(p, gx, gy)
        return Products(norm2_x=x @ x,
                        Jt_x=jnp.matmul(J.T, x,
                                        preferred_element_type=DTYPE),
                        JtJ=jnp.matmul(J.T, J,
                                       preferred_element_type=DTYPE))

    for tag, prod, data in (
            ("factored",
             lambda p, st: sp.factored_products(p, st, G_pair), stats),
            ("general", products, meas)):
        for k in (1, 2, 4):
            def run(q, s, _k=k, _prod=prod):
                r = batched_optimize_compacted(
                    _prod, q, PRM, problem_data=s, wavefront_unroll=_k)
                return r.p, r.n_attempts

            f = jax.jit(run)
            _, na = f(p0s, data)
            useful = int(np.sum(np.asarray(na)))
            dt = measure_loop(lambda q, s: run(q, s), p0s, data)
            print(json.dumps({"exp": f"unroll_{tag}", "unroll": k,
                              "solves_per_s": BATCH / dt,
                              "useful_attempts": useful,
                              "ns_per_attempt": dt / useful * 1e9}))


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = dict(headline=headline, plain=plain_uncompacted,
               batch_minor=batch_minor, headline_minor=headline_minor,
               factored=factored, factored_minor=factored_minor,
               unroll=unroll_sweep)
    for name, fn in fns.items():
        if which in (name, "all"):
            fn()
