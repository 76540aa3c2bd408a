"""Cell-compacted active-ENTRY short-range gravity vs the dense path
(docs/compact_active_design.md — the round-4 per-particle economy tier).

The entry kernel [G2: gravtree.c walks only the active list] must match
the dense kernel exactly on active particles for clustered, wrap-
straddling, spread, spilled (>lanes per cell) and empty activity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.neighbors import build_cell_list
from gadget_leicester_tpu.ops.pallas_cells import (
    build_active_entries, count_active_entries,
    shortrange_gravity_pallas_dma9, shortrange_gravity_pallas_entries)

BOX = 1.0
N_CELLS = 5
CAP = 64
LANES = 8


def _setup(seed, n=900):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 3)) * BOX
    k = n // 3
    pos[:k] = 0.08 + 0.12 * rng.random((k, 3))   # corner halo
    mass = rng.random(n).astype(np.float32) + 0.5
    soft = np.full(n, 0.02, np.float32)
    alive = np.ones(n, bool)
    alive[-7:] = False
    return (jnp.asarray(pos, jnp.float32), jnp.asarray(mass),
            jnp.asarray(soft), jnp.asarray(alive))


def _active_for(mode, pos, alive, n):
    if mode == "corner":
        return (pos[:, 0] < 0.25) & (pos[:, 1] < 0.25) & alive
    if mode == "wrap":
        return ((pos[:, 0] > 0.9) | (pos[:, 0] < 0.1)) & \
            (pos[:, 1] < 0.3) & (pos[:, 2] < 0.3) & alive
    if mode == "spread":
        # every ~30th particle: activity in most cells, ~1-2 per cell —
        # the measured late-time lcdm_gas structure
        return (jnp.arange(n) % 29 == 0) & alive
    if mode == "spill":
        # a dense knot: some cells hold far more than LANES active targets
        return (pos[:, 0] < 0.2) & (pos[:, 1] < 0.2) & \
            (pos[:, 2] < 0.2) & alive
    return jnp.zeros(n, bool)


@pytest.mark.parametrize("mode", ["corner", "wrap", "spread", "spill",
                                  "empty"])
def test_entries_match_dense(mode):
    pos, mass, soft, alive = _setup(3)
    n = pos.shape[0]
    asmth, rcut = 0.06, 0.27
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=CAP, periodic=True)
    active = _active_for(mode, pos, alive, n)

    k_max = 256
    ec, es, total = build_active_entries(cl, active, LANES, k_max)
    assert int(total) <= k_max
    # the O(N) gate counts via cell_of, which still includes particles a
    # full cell DROPPED; it is an upper bound (equality iff no overflow)
    assert int(count_active_entries(cl, active, LANES)) >= int(total)
    if not bool(cl.overflow):
        assert int(count_active_entries(cl, active, LANES)) == int(total)

    acc_d, pot_d, _ = shortrange_gravity_pallas_dma9(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=asmth, rcut=rcut, periodic=True, active=active, cl=cl,
        with_potential=True, interpret=True)
    acc_e, pot_e, _ = shortrange_gravity_pallas_entries(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=asmth, rcut=rcut, entry_cell=ec, entry_slot=es, cl=cl,
        periodic=True, with_potential=True, interpret=True)

    a = np.asarray(active)
    # the entry kernel reduces [lanes, 3cap] slabs where the dense kernel
    # reduces [cap, 3cap] — summation order differs, so parity is
    # rounding-level, not bitwise (both verified ~1e-6 of an f64 oracle)
    scale = np.abs(np.asarray(acc_d)[a]).max() + 1e-30 if a.any() else 1.0
    np.testing.assert_allclose(np.asarray(acc_e)[a],
                               np.asarray(acc_d)[a], rtol=2e-4,
                               atol=2e-4 * scale)
    pscale = np.abs(np.asarray(pot_d)[a]).max() + 1e-30 if a.any() else 1.0
    np.testing.assert_allclose(np.asarray(pot_e)[a],
                               np.asarray(pot_d)[a], rtol=2e-4,
                               atol=2e-4 * pscale)
    # untouched rows stay zero (callers keep frozen values)
    assert float(jnp.max(jnp.abs(jnp.asarray(acc_e)[~a]))) == 0.0
    if mode == "empty":
        assert int(total) == 0


def test_entries_structure():
    """Entry bookkeeping: every active slot appears exactly once; spilled
    cells occupy consecutive entries with the same cell id."""
    pos, mass, soft, alive = _setup(11)
    n = pos.shape[0]
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=CAP, periodic=True)
    active = _active_for("spill", pos, alive, n)
    ec, es, total = build_active_entries(cl, active, LANES, 256)
    ecn, esn = np.asarray(ec), np.asarray(es)
    cells = np.asarray(cl.cells)
    seen = []
    for e in range(int(total)):
        assert ecn[e] >= 0
        for l in range(LANES):
            if esn[e, l] >= 0:
                pidx = cells[ecn[e], esn[e, l]]
                assert pidx >= 0 and bool(active[pidx])
                seen.append(int(pidx))
    # expectation = actives RETAINED in the cell list (an over-capacity
    # cell drops particles from cells[]; overflow is flagged upstream)
    act_np = np.asarray(active)
    retained = set(int(i) for i in cells[cells >= 0].ravel()
                   if act_np[int(i)])
    assert sorted(seen) == sorted(retained)
    assert len(seen) == len(set(seen))
    # padding tail is all -1
    assert (ecn[int(total):] == -1).all()


def test_entries_vacuum():
    """Non-periodic geometry: pad rows are parked/dead, edges exact."""
    pos, mass, soft, alive = _setup(5)
    n = pos.shape[0]
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=CAP, periodic=False)
    active = (pos[:, 0] < 0.15) | (pos[:, 0] > 0.85)
    active = active & alive
    ec, es, total = build_active_entries(cl, active, LANES, 256)
    acc_d, _ = shortrange_gravity_pallas_dma9(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=0.0, rcut=0.3, periodic=False, active=active, cl=cl,
        interpret=True)
    acc_e, _ = shortrange_gravity_pallas_entries(
        pos, mass, soft, alive, BOX, n_cells=N_CELLS, capacity=CAP,
        asmth=0.0, rcut=0.3, entry_cell=ec, entry_slot=es, cl=cl,
        periodic=False, interpret=True)
    a = np.asarray(active)
    scale = np.abs(np.asarray(acc_d)[a]).max() + 1e-30
    np.testing.assert_allclose(np.asarray(acc_e)[a],
                               np.asarray(acc_d)[a], rtol=2e-4,
                               atol=2e-4 * scale)
