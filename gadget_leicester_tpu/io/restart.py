"""Bitwise restart checkpointing — rebuild of [G2: restart.c].

The reference dumps per-rank binary images of All/P/SphP; resuming needs
the same NTask. Here the checkpoint is a sharding-agnostic flat npz of the
full SimState pytree + the step bookkeeping — restorable onto ANY mesh
shape (the elastic-resume win noted in SURVEY.md §5).

Bitwise-exact resume: arrays round-trip through npz unchanged, so the
continued trajectory is bit-identical to an uninterrupted run (tested).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from gadget_leicester_tpu.core.state import (GasState, ParticleState,
                                             SimState, SinkState)


def save_restart(path: str, state: SimState, step_count: int = 0,
                 extra_meta: dict | None = None) -> None:
    from gadget_leicester_tpu.core.state import strip_grids
    # the grid cache is derived data with config-dependent shapes; restarts
    # stay sharding- AND capacity-agnostic by rebuilding it on resume
    leaves, treedef = jax.tree_util.tree_flatten(strip_grids(state))
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {"step_count": step_count, "n_leaves": len(leaves)}
    if extra_meta:
        meta.update(extra_meta)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_restart(path: str) -> tuple[SimState, dict]:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    # reconstruct treedef from a dummy state with matching structure
    treedef = _treedef_for(leaves)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta


def _treedef_for(leaves):
    """SimState flattening order is deterministic (registered dataclasses
    flatten field-by-field); rebuild the treedef from the class structure."""
    import jax.tree_util as jtu

    def dummy(cls):
        fields = [f.name for f in dataclasses.fields(cls)]
        return cls(**{f: 0 for f in fields})

    skeleton = SimState(
        p=dummy(ParticleState), gas=dummy(GasState), sinks=dummy(SinkState),
        ti_current=0, pm_ti_endstep=0, pm_ti_begstep=0, rng_key=0,
        overflow_flags=0,
    )
    return jtu.tree_structure(skeleton)
