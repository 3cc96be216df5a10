"""Device-mesh helpers.

The reference is strictly single-threaded and single-process (SURVEY.md
section 2.2); all distribution in this framework is new capability, built on
jax.sharding over a named device mesh — collectives ride ICI within a slice
and DCN across hosts, inserted by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_names: Sequence[str],
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a named mesh over the available devices.

    With no shape, uses all devices along the first axis name. For multi-host
    runs, call jax.distributed.initialize() first; jax.devices() then spans
    all processes and the mesh does too.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, tuple(axis_names))
