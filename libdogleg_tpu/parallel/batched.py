"""Batched independent solves, sharded across a device mesh.

The data-parallel row of SURVEY.md's parallelism table: the reference solves
one problem per process (dogleg.c:1633); here a batch of independent problem
instances is vmapped into one program and its batch axis sharded across
chips/hosts. There is no cross-problem communication — scaling is
embarrassingly parallel, and each batch element freezes at its own
termination point inside the shared while_loop (cost per wavefront = the
slowest still-running element).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libdogleg_tpu.params import DoglegParameters
from libdogleg_tpu.solver import SolveResult, solve_products


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Place a pytree of batch-leading arrays with the batch axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree)


def batched_optimize(products_fn,
                     p0_batch: jnp.ndarray,
                     parameters: Optional[DoglegParameters] = None,
                     *,
                     mesh: Optional[Mesh] = None,
                     axis_name: str = "dp",
                     problem_data: Any = None) -> SolveResult:
    """Solve a batch of independent problems, optionally mesh-sharded.

    Args:
      products_fn: either p -> Products (shared problem data, distinct
        starts), or (p, data_i) -> Products when problem_data is given
        (per-element problem instances — the 10k-problems-per-chip benchmark
        configuration, BASELINE.md config 3).
      p0_batch: (B, Nstate) initial states.
      mesh/axis_name: if given, constrain inputs and results to be sharded
        along the batch axis of this mesh; XLA partitions the whole vmapped
        while_loop with zero communication.
      problem_data: optional pytree with leading batch axis.

    Returns a SolveResult whose leaves carry the leading batch axis.
    """
    prm = parameters if parameters is not None else DoglegParameters()

    if problem_data is None:
        solve_one = lambda p0: solve_products(products_fn, p0, prm)
        args = (p0_batch,)
    else:
        solve_one = lambda p0, data: solve_products(
            lambda p: products_fn(p, data), p0, prm)
        args = (p0_batch, problem_data)

    fn = jax.vmap(solve_one)
    if mesh is not None:
        spec = P(axis_name)
        in_shardings = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, spec), args)
        fn = jax.jit(fn, in_shardings=in_shardings,
                     out_shardings=NamedSharding(mesh, spec))
    else:
        fn = jax.jit(fn)
    return fn(*args)
