"""Cell-list correctness vs the all-pairs oracle (SURVEY.md §7 step 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.neighbors import build_cell_list
from gadget_leicester_tpu.ops.sph_cells import (density_sums_cells,
                                                hydro_force_cells)
from gadget_leicester_tpu.ops.sph_dense import density_sums, hydro_force


def _setup(rng, n=300, periodic=False, box=2.0):
    if periodic:
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    else:
        pos = rng.uniform(0.1, box - 0.1, (n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = np.full(n, 1.0 / n, np.float32)
    h = np.full(n, 0.25, np.float32)
    mask = np.ones(n, bool)
    mask[-5:] = False  # some dead particles
    return (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(h), jnp.asarray(mask))


@pytest.mark.parametrize("periodic", [False, True])
def test_density_cells_vs_dense(rng, periodic):
    box = 2.0
    pos, vel, mass, h, mask = _setup(rng, periodic=periodic, box=box)
    # cell size must be >= max h: n_cells = floor(box / h_max)
    n_cells = int(box / 0.26)
    cl = build_cell_list(pos, mask, 0.0, box, n_cells=n_cells, capacity=64,
                         periodic=periodic)
    assert not bool(cl.overflow)
    r1 = density_sums(pos, vel, mass, h, mask, box=box, block=64,
                      periodic=periodic)
    r2 = density_sums_cells(cl, pos, vel, mass, h, mask, box=box, block=64,
                            periodic=periodic)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("periodic", [False, True])
def test_hydro_cells_vs_dense(rng, periodic):
    box = 2.0
    pos, vel, mass, h, mask = _setup(rng, periodic=periodic, box=box)
    rho, drho, divv, rot = density_sums(pos, vel, mass, h, mask, box=box,
                                        block=64, periodic=periodic)
    rho = jnp.maximum(rho, 1e-3)
    pressure = 0.5 * rho ** (5.0 / 3.0)
    fi = jnp.ones_like(rho)
    dv = divv / rho
    cv = jnp.sqrt(jnp.sum(rot**2, -1)) / rho
    args = (pos, vel, mass, h, rho, pressure, fi, dv, cv, mask)
    kw = dict(visc_const=0.8, box=box, periodic=periodic, block=64)
    r1 = hydro_force(*args, **kw)
    n_cells = int(box / 0.26)
    cl = build_cell_list(pos, mask, 0.0, box, n_cells=n_cells, capacity=64,
                         periodic=periodic)
    r2 = hydro_force_cells(cl, *args, **kw)
    np.testing.assert_allclose(np.asarray(r1.acc), np.asarray(r2.acc),
                               rtol=3e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.dt_entropy),
                               np.asarray(r2.dt_entropy), rtol=3e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.max_signal_vel),
                               np.asarray(r2.max_signal_vel), rtol=1e-4, atol=1e-5)


def test_cell_list_overflow_flag(rng):
    n = 200
    pos = jnp.zeros((n, 3), jnp.float32) + 0.5  # all in one cell
    mask = jnp.ones(n, bool)
    cl = build_cell_list(pos, mask, 0.0, 1.0, n_cells=4, capacity=16)
    assert bool(cl.overflow)
    cl2 = build_cell_list(pos, mask, 0.0, 1.0, n_cells=4, capacity=256)
    assert not bool(cl2.overflow)


def test_cell_list_counts(rng):
    n = 100
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    mask = jnp.ones(n, bool)
    cl = build_cell_list(pos, mask, 0.0, 1.0, n_cells=3, capacity=32)
    assert int(cl.counts.sum()) == n
    # every particle appears exactly once in the cells array
    cells = np.asarray(cl.cells)
    idx = cells[cells >= 0]
    assert len(idx) == n
    assert len(np.unique(idx)) == n


def test_shortrange_cells_vs_direct(rng):
    from gadget_leicester_tpu.ops.gravity_direct import direct_gravity
    from gadget_leicester_tpu.ops.gravity_short import shortrange_gravity_cells
    n, box = 256, 4.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    soft = jnp.full((n,), 0.05, jnp.float32)
    alive = jnp.ones(n, bool)
    asmth = 0.2
    rcut = 4.5 * asmth  # 0.9 < cell size
    n_cells = int(box / rcut)
    cl = build_cell_list(pos, alive, 0.0, box, n_cells=n_cells, capacity=128,
                         periodic=True)
    acc_c = shortrange_gravity_cells(cl, pos, mass, soft, alive, asmth, rcut,
                                     box=box, periodic=True)
    acc_d, _ = direct_gravity(pos, mass, soft, alive, box=box, asmth=asmth,
                              rcut=rcut, periodic=True, block=64)
    np.testing.assert_allclose(np.asarray(acc_c), np.asarray(acc_d),
                               rtol=1e-4, atol=1e-5)
