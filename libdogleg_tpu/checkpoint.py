"""Checkpoint / resume for (batched) solver state.

The reference has no checkpointing — its nearest analog is returnContext,
which lets the caller *inspect* final solver state (reference dogleg.h:273-276,
dogleg.c:1694-1695) but not resume it. Here the solver state is an ordinary
pytree (solver.init_solver_state / run_solver), so checkpointing is plain
serialization: save after a bounded run_solver slice, reload in a new
process, keep iterating. The continuation is trajectory-exact: every cache
(Cauchy/GN steps, factorization lambda, trust region, history) lives in the
state, so the resumed run takes the same accept/reject decisions and attempt
counts as a one-shot solve; values agree up to XLA fusion-level rounding
(different compilations may fuse multiplies differently, ~ulp per step).

Storage is a flat .npz (no orbax dependency for a single-host state; for
multi-host sharded states, pass the state pytree to orbax directly — it is
checkpointable as-is).
"""

from __future__ import annotations

import numpy as np

from libdogleg_tpu.solver import History, _Carry


def _flatten(state: _Carry) -> dict:
    out = {}
    for name, value in state._asdict().items():
        if name == "history":
            if value is not None:
                for hname, hval in value._asdict().items():
                    out[f"history__{hname}"] = np.asarray(hval)
            continue
        out[name] = np.asarray(value)
    return out


def _unflatten(data: dict) -> _Carry:
    hist_fields = {k[len("history__"):]: v for k, v in data.items()
                   if k.startswith("history__")}
    history = History(**hist_fields) if hist_fields else None
    fields = {k: v for k, v in data.items() if not k.startswith("history__")}
    return _Carry(history=history, **fields)


def save_state(path: str, state: _Carry) -> None:
    """Write a solver state (optionally vmapped/batched) to an .npz file."""
    np.savez(path, **_flatten(state))


def load_state(path: str) -> _Carry:
    """Load a solver state saved by save_state."""
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def save_state_orbax(path: str, state: _Carry) -> None:
    """Write a solver state through orbax — the right choice for multi-host
    sharded states, where each host writes only its shards. The state is an
    ordinary pytree, so this is a thin convenience wrapper."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_state_orbax(path: str, like: _Carry) -> _Carry:
    """Restore a solver state saved by save_state_orbax. `like` provides the
    target structure/shardings (e.g. a freshly built init_solver_state on
    the same mesh); pass the live pytree — orbax restores onto its
    shapes/shardings."""
    import jax
    import orbax.checkpoint as ocp
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=getattr(x, "sharding", None)), like)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
