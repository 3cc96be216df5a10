"""Pytree vector kernels.

State vectors (p, Jt_x, steps) are pytrees: a flat (Nstate,) array in the
common case, or any structured pytree — e.g. {"c": cameras, "q": points}
for sharded bundle-adjustment states, where each leaf carries its own mesh
sharding and GSPMD keeps the solve distributed. These are the tree
generalizations of the reference's flat-vector kernels (dogleg.c:186-250).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_dot(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return sum(jnp.sum(x * y) for x, y in zip(la, lb))


def tree_scale(k, a):
    return jax.tree_util.tree_map(lambda x: k * x, a)


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b)


def tree_any_exceeds(a, threshold):
    flags = [jnp.any(jnp.abs(x) > threshold)
             for x in jax.tree_util.tree_leaves(a)]
    out = flags[0]
    for f in flags[1:]:
        out = out | f
    return out
