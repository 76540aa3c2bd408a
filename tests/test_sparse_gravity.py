"""Sparse (compacted active-tile) short-range gravity vs the dense path.

The sparse variant [G2: timestep.c — only the active list gets new
forces] must reproduce the dense kernel's accelerations exactly on
active particles for any clustered activity pattern, including activity
near the periodic wrap and empty active sets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.neighbors import build_cell_list
from gadget_leicester_tpu.ops.pallas_cells import (
    dilate_flags, grav_tile_flags, shortrange_gravity_pallas_dma9,
    shortrange_gravity_pallas_dma9_sparse)

BOX = 1.0
N_CELLS = 5
CAP = 64


def _setup(seed, n=900, clustered=True):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 3)) * BOX
    if clustered:
        # put a third of them in one corner halo so activity is compact
        k = n // 3
        pos[:k] = 0.08 + 0.12 * rng.random((k, 3))
    mass = rng.random(n).astype(np.float32) + 0.5
    soft = np.full(n, 0.02, np.float32)
    alive = np.ones(n, bool)
    alive[-7:] = False
    return (jnp.asarray(pos, jnp.float32), jnp.asarray(mass),
            jnp.asarray(soft), jnp.asarray(alive))


@pytest.mark.parametrize("mode", ["corner", "wrap", "empty"])
def test_sparse_matches_dense(mode):
    pos, mass, soft, alive = _setup(3)
    n = pos.shape[0]
    asmth, rcut = 0.06, 0.27
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=CAP, periodic=True)
    if mode == "corner":
        active = (pos[:, 0] < 0.25) & (pos[:, 1] < 0.25) & alive
    elif mode == "wrap":
        # activity straddling the periodic boundary in x
        active = ((pos[:, 0] > 0.9) | (pos[:, 0] < 0.1)) & \
            (pos[:, 1] < 0.3) & (pos[:, 2] < 0.3) & alive
    else:
        active = jnp.zeros(n, bool)

    flags = grav_tile_flags(cl, active, N_CELLS)
    needed = dilate_flags(flags > 0, N_CELLS, True)
    c3 = N_CELLS ** 3
    k_act, k_pack = c3, c3   # capacity is not under test here

    acc_d, pot_d, _ = shortrange_gravity_pallas_dma9(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=asmth, rcut=rcut, periodic=True, active=active, cl=cl,
        with_potential=True, interpret=True)
    acc_s, pot_s, _ = shortrange_gravity_pallas_dma9_sparse(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=asmth, rcut=rcut, flags=flags, needed=needed,
        k_act=k_act, k_pack=k_pack, cl=cl, periodic=True,
        with_potential=True, interpret=True)

    a = np.asarray(active)
    np.testing.assert_allclose(np.asarray(acc_s)[a],
                               np.asarray(acc_d)[a], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pot_s)[a],
                               np.asarray(pot_d)[a], rtol=0, atol=1e-6)
    # inactive rows are zero in the sparse result (caller keeps frozen acc)
    if mode == "empty":
        assert float(jnp.max(jnp.abs(acc_s))) == 0.0


def test_sparse_tight_capacities():
    """k_act/k_pack sized exactly to the activity pattern still exact."""
    pos, mass, soft, alive = _setup(11)
    active = (pos[:, 0] < 0.2) & (pos[:, 1] < 0.2) & (pos[:, 2] < 0.2) \
        & alive
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=CAP, periodic=True)
    flags = grav_tile_flags(cl, active, N_CELLS)
    needed = dilate_flags(flags > 0, N_CELLS, True)
    k_act = int(jnp.sum(flags))
    k_pack = int(jnp.sum(needed))
    assert k_act >= 1
    asmth, rcut = 0.06, 0.27
    acc_d, _ = shortrange_gravity_pallas_dma9(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=asmth, rcut=rcut, periodic=True, active=active, cl=cl,
        interpret=True)
    acc_s, _ = shortrange_gravity_pallas_dma9_sparse(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=asmth, rcut=rcut, flags=flags, needed=needed,
        k_act=k_act, k_pack=k_pack, cl=cl, periodic=True, interpret=True)
    a = np.asarray(active)
    np.testing.assert_allclose(np.asarray(acc_s)[a],
                               np.asarray(acc_d)[a], rtol=0, atol=1e-6)
