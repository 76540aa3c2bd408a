"""Device mesh + state sharding utilities."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gadget_leicester_tpu.core.state import SimState

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested {n_devices} devices but only {len(devs)} "
                f"available ({devs[0].platform}); for CPU-simulated meshes "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "and jax.config.update('jax_platforms', 'cpu')")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _spec_for(path_leaf, mesh: Mesh):
    """Particle/gas arrays (leading dim >= mesh size and divisible) are
    sharded on dim 0; scalars and small arrays replicate."""
    leaf = path_leaf
    n_sh = mesh.shape[AXIS]
    if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] >= n_sh \
            and leaf.shape[0] % n_sh == 0:
        return NamedSharding(mesh, P(AXIS, *([None] * (leaf.ndim - 1))))
    return NamedSharding(mesh, P())


def state_shardings(state: SimState, mesh: Mesh):
    return jax.tree_util.tree_map(lambda leaf: _spec_for(leaf, mesh), state)


def shard_state(state: SimState, mesh: Mesh) -> SimState:
    """Place a SimState onto the mesh (particle dims sharded)."""
    sh = state_shardings(state, mesh)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def replicate_state(state: SimState, mesh: Mesh) -> SimState:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
