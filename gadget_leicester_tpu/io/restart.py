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
    meta = {"step_count": step_count, "n_leaves": len(leaves),
            "field_manifest": _field_manifest()}
    if extra_meta:
        meta.update(extra_meta)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_restart(path: str) -> tuple[SimState, dict]:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    # unflattening uses the CURRENT class layout; a dump written before a
    # SimState field change would silently land leaves in the wrong slots.
    # The stored field manifest makes the mismatch a clear error instead.
    stored = meta.get("field_manifest")
    current = _field_manifest()
    if stored is not None and stored != current:
        missing = [f for f in stored if f not in current]
        added = [f for f in current if f not in stored]
        raise ValueError(
            "restart dump layout does not match the current SimState "
            f"definition (dump fields missing now: {missing}; fields added "
            f"since the dump: {added}). Re-start from a snapshot "
            "(RestartFlag=2) instead [G2: restart.c version check].")
    treedef = _treedef_for(leaves)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta


def _field_manifest() -> list[str]:
    """Qualified field names in flattening order — the restart layout tag."""
    names = []
    for prefix, cls in (("p", ParticleState), ("gas", GasState),
                        ("sinks", SinkState)):
        names += [f"{prefix}.{f.name}" for f in dataclasses.fields(cls)]
    names += [f.name for f in dataclasses.fields(SimState)
              if f.name not in ("p", "gas", "sinks", "grids")]
    return names


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
