"""Parity: the cell-tile one-hot-matmul CIC gather (ops.pm_tiles) against
the row-gather reference (ops.pm.cic_gather_vec) — fresh and stale cells,
wrapped and unwrapped positions [G2: pm_periodic.c interpolation loop]."""

import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.neighbors import build_cell_list
from gadget_leicester_tpu.ops.pm import cic_deposit, cic_gather_vec
from gadget_leicester_tpu.ops.pm_tiles import (pm_deposit_tiles,
                                               pm_gather_tiles)


BOX = 100.0
N_PM = 32
N_CELLS = 5


def _setup(rng, n=900, dead_frac=0.1):
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    alive = rng.uniform(size=n) > dead_frac
    field = rng.normal(size=(N_PM, N_PM, N_PM, 3)).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(alive), jnp.asarray(field)


def _ref(field, pos, alive):
    out = cic_gather_vec(field, jnp.mod(pos, BOX), BOX, N_PM)
    return jnp.where(alive[:, None], out, 0.0)


@pytest.mark.parametrize("margin_pm", [0.5, 2.0])
def test_gather_matches_rowgather(rng, margin_pm):
    pos, alive, field = _setup(rng)
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=128, periodic=True)
    got = pm_gather_tiles(field, cl, pos, alive, BOX, N_PM, N_CELLS,
                          margin_pm=margin_pm, interpret=True)
    want = _ref(field, pos, alive)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gather_stale_cells_and_wrap(rng):
    """Positions drift (incl. across the periodic seam) AFTER the cell
    build; the margin-sized window must still cover every particle."""
    pos, alive, field = _setup(rng)
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=128, periodic=True)
    cell = BOX / N_CELLS
    margin = 0.25 * cell                      # drift budget (length units)
    drift = rng.uniform(-margin / 2, margin / 2, pos.shape).astype(
        np.float32)
    newpos = pos + jnp.asarray(drift)         # UNWRAPPED: may leave [0,box)
    margin_pm = margin * N_PM / BOX
    got = pm_gather_tiles(field, cl, newpos, alive, BOX, N_PM, N_CELLS,
                          margin_pm=margin_pm, interpret=True)
    want = _ref(field, newpos, alive)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_deposit_matches_scatter(rng):
    pos, alive, _f = _setup(rng)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, pos.shape[0]).astype(
        np.float32))
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=128, periodic=True)
    got = pm_deposit_tiles(cl, pos, mass, alive, BOX, N_PM, N_CELLS,
                           margin_pm=1.0, interpret=True)
    want = cic_deposit(jnp.mod(pos, BOX),
                       jnp.where(alive, mass, 0.0), BOX, N_PM)
    # exact mass conservation and per-mesh-cell parity
    np.testing.assert_allclose(float(jnp.sum(got)),
                               float(jnp.sum(jnp.where(alive, mass, 0.0))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_deposit_stale_cells_and_wrap(rng):
    pos, alive, _f = _setup(rng)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, pos.shape[0]).astype(
        np.float32))
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=128, periodic=True)
    cell = BOX / N_CELLS
    margin = 0.25 * cell
    drift = rng.uniform(-margin / 2, margin / 2, pos.shape).astype(
        np.float32)
    newpos = pos + jnp.asarray(drift)
    margin_pm = margin * N_PM / BOX
    got = pm_deposit_tiles(cl, newpos, mass, alive, BOX, N_PM, N_CELLS,
                           margin_pm=margin_pm, interpret=True)
    want = cic_deposit(jnp.mod(newpos, BOX),
                       jnp.where(alive, mass, 0.0), BOX, N_PM)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gather_with_potential_column(rng):
    """K=4 layout (fx, fy, fz, phi) — the with_potential force stack."""
    pos, alive, field3 = _setup(rng)
    phi = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(N_PM, N_PM, N_PM, 1)).astype(np.float32))
    field = jnp.concatenate([field3, phi], axis=-1)
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=N_CELLS,
                         capacity=128, periodic=True)
    got = pm_gather_tiles(field, cl, pos, alive, BOX, N_PM, N_CELLS,
                          margin_pm=1.0, interpret=True)
    want = _ref(field, pos, alive)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
