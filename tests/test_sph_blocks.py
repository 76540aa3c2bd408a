"""Block-packed SPH kernels vs the all-pairs oracle (interpret mode on
CPU; the DMA variants run the same math on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.sph_blocks import (build_block_lists,
                                                 density_adaptive_blocks,
                                                 hydro_force_blocks)
from gadget_leicester_tpu.ops.sph_dense import (density_adaptive,
                                                hydro_force)


def _setup(rng, n=3000, periodic=False, box=2.0):
    if periodic:
        pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    else:
        pos = rng.uniform(0.05, box - 0.05, (n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = np.full(n, 1.0 / n, np.float32)
    h = np.full(n, 0.25, np.float32)
    mask = np.ones(n, bool)
    mask[-5:] = False
    return (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(h), jnp.asarray(mask))


def test_block_lists_complete(rng):
    """Every masked particle appears exactly once in each packing."""
    n, box = 500, 2.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mask = np.ones(n, bool)
    mask[::7] = False
    mask = jnp.asarray(mask)
    cl_e, cl_o = build_block_lists(pos, mask, 0.0, box, n_blocks=3,
                                   subcap=64, periodic=True)
    assert not bool(cl_e.overflow)
    for cl in (cl_e, cl_o):
        cells = np.asarray(cl.cells)
        idx = cells[cells >= 0]
        assert len(idx) == int(mask.sum())
        assert len(np.unique(idx)) == int(mask.sum())


@pytest.mark.parametrize("periodic", [False, True])
def test_density_blocks_vs_dense(rng, periodic):
    box = 2.0
    pos, vel, mass, h, mask = _setup(rng, periodic=periodic, box=box)
    # subcell edge must be >= max h: 2*n_blocks <= box / h_max
    n_blocks = 2  # subcell = 2/4 = 0.5 > max converged h (~0.35)
    max_hsml = box / (2 * n_blocks)
    r1 = density_adaptive(pos, vel, mass, h, mask, des_num_ngb=33.0,
                          max_dev=2.0, box=box, periodic=periodic)
    assert float(jnp.max(jnp.where(mask, r1.hsml, 0.0))) < max_hsml
    r2, _ = density_adaptive_blocks(
        pos, vel, mass, h, mask, des_num_ngb=33.0, max_dev=2.0,
        box=box if periodic else 1.0, n_blocks=n_blocks, subcap=128,
        max_hsml=max_hsml, periodic=periodic,
        origin=0.0 if periodic else -0.01,
        extent=box if periodic else box + 0.02, interpret=True)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(r1.rho)[m], np.asarray(r2.rho)[m],
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.hsml)[m], np.asarray(r2.hsml)[m],
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(r1.div_vel)[m],
                               np.asarray(r2.div_vel)[m], rtol=1e-2,
                               atol=1e-4)


@pytest.mark.parametrize("periodic", [False, True])
def test_hydro_blocks_vs_dense(rng, periodic):
    box = 2.0
    pos, vel, mass, h, mask = _setup(rng, periodic=periodic, box=box)
    n_blocks = 2
    max_hsml = box / (2 * n_blocks)
    dres, cls = density_adaptive_blocks(
        pos, vel, mass, h, mask, des_num_ngb=33.0, max_dev=2.0,
        box=box if periodic else 1.0, n_blocks=n_blocks, subcap=128,
        max_hsml=max_hsml, periodic=periodic,
        origin=0.0 if periodic else -0.01,
        extent=box if periodic else box + 0.02, interpret=True)
    rho = jnp.maximum(dres.rho, 1e-3)
    pressure = jnp.where(mask, 0.5 * rho ** (5.0 / 3.0), 0.0)
    args = (pos, vel, mass, dres.hsml, rho, pressure, dres.dhsml_factor,
            dres.div_vel, dres.curl_vel, mask)
    r1 = hydro_force(*args, visc_const=0.8, box=box, periodic=periodic,
                     block=64)
    r2 = hydro_force_blocks(cls, *args, visc_const=0.8,
                            box=box if periodic else 1.0,
                            interpret=True)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(r1.acc)[m], np.asarray(r2.acc)[m],
                               rtol=3e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1.dt_entropy)[m],
                               np.asarray(r2.dt_entropy)[m],
                               rtol=3e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.max_signal_vel)[m],
                               np.asarray(r2.max_signal_vel)[m],
                               rtol=1e-4, atol=1e-5)


def test_density_blocks_activity_gating(rng):
    """Gated solve matches the all-active solve on ACTIVE rows and
    returns fill values (discarded by the caller) elsewhere."""
    box = 2.0
    pos, vel, mass, h, mask = _setup(rng, periodic=True, box=box)
    n_blocks = 2
    max_hsml = box / (2 * n_blocks)
    active = jnp.asarray(rng.uniform(size=pos.shape[0]) < 0.3)
    r_all, _ = density_adaptive_blocks(
        pos, vel, mass, h, mask, des_num_ngb=33.0, max_dev=2.0,
        box=box, n_blocks=n_blocks, subcap=128,
        max_hsml=max_hsml, periodic=True, interpret=True)
    r_act, _ = density_adaptive_blocks(
        pos, vel, mass, h, mask, des_num_ngb=33.0, max_dev=2.0,
        box=box, n_blocks=n_blocks, subcap=128,
        max_hsml=max_hsml, periodic=True, interpret=True, active=active)
    m = np.asarray(mask & active)
    np.testing.assert_allclose(np.asarray(r_act.rho)[m],
                               np.asarray(r_all.rho)[m], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r_act.hsml)[m],
                               np.asarray(r_all.hsml)[m], rtol=1e-5)
