"""Measurement-axis (row-block) sharding of the Jacobian.

The TPU-native answer to the reference's sparse-scaling story (SURVEY.md
sections 2.2 and 5.7): the products the solver consumes — norm2(x), J^T x,
J^T J — are all *sums over the measurement axis*, so partitioning measurement
row blocks across devices and psum-ing the per-device partial products is
mathematically exact. Each device evaluates only its rows of the residual and
Jacobian; the Nstate-sized trust-region iteration then runs replicated on
every device (it is tiny), with the only communication being one psum of
(1 + Nstate + Nstate^2) floats per operating-point evaluation, riding ICI.

This is the tensor-parallel row in SURVEY.md's parallelism table and the
structural analog of sequence/context parallelism for this workload (the
measurement axis is the long axis).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from libdogleg_tpu.ops import dense as dops
from libdogleg_tpu.solver import Products


def measurement_sharded_products(
        f_shard: Callable[[jnp.ndarray, Any],
                          Tuple[jnp.ndarray, jnp.ndarray]],
        mesh: Mesh,
        axis_name: str,
) -> Callable[[jnp.ndarray, Any], Products]:
    """Wrap a per-shard dense residual function into a global Products fn.

    Args:
      f_shard: (p, data_shard) -> (x_shard, J_shard) evaluating only this
        device's measurement rows. data_shard is any pytree whose leaves have
        the measurement axis leading.
      mesh: the device mesh.
      axis_name: mesh axis to shard the measurement dimension over.

    Returns:
      products(p, data) -> Products where data leaves are (globally shaped)
      arrays sharded along their leading axis. The partial products are
      reduced with psum — exact, per the sums-over-measurements identity.
    """

    def local(p, data_shard):
        x, J = f_shard(p, data_shard)
        partial = Products(norm2_x=dops.norm2(x),
                           Jt_x=dops.jt_dot(J, x),
                           JtJ=dops.build_jtj(J))
        return jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, axis_name), partial)

    # in_specs are pytree prefixes: P(axis_name) applies to every leaf of the
    # data pytree (all leaves carry the measurement axis leading).
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(), P(axis_name)), out_specs=P())


@dataclasses.dataclass(frozen=True)
class MeasurementShardedProblem:
    """A dense problem whose measurement rows are partitioned over a mesh
    axis. Presents the same `products` interface as the single-device
    adapters, so `optimize`/`solve_products` work unchanged — the entire
    solve jits into one program with XLA-inserted collectives.

    Attributes:
      f: (p, data_shard) -> (x_shard, J_shard), evaluated per device.
      data: pytree of arrays with the measurement axis leading (global view;
        place with jax.device_put(..., NamedSharding(mesh, P(axis_name)))
        for best performance — GSPMD will reshard otherwise).
      mesh / axis_name: where the measurement axis lives.
    """
    f: Callable[[jnp.ndarray, Any], Tuple[jnp.ndarray, jnp.ndarray]]
    data: Any
    mesh: Mesh
    axis_name: str = "meas"

    def products(self, p: jnp.ndarray) -> Products:
        def local(p, data_shard):
            x, J = self.f(p, data_shard)
            partial = Products(norm2_x=dops.norm2(x),
                               Jt_x=dops.jt_dot(J, x),
                               JtJ=dops.build_jtj(J))
            return jax.tree_util.tree_map(
                lambda a: jax.lax.psum(a, self.axis_name), partial)

        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=(P(), P(self.axis_name)), out_specs=P())
        return fn(p, self.data)
