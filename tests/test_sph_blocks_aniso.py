"""Anisotropic (per-axis) block grids vs the all-pairs oracle — the
geometry the SPMD slab step uses: non-periodic extended x over the slab,
periodic y/z over the box, uniform fine-cell edge.

Oracle validity: all particles are confined to x in [0.2, 0.8] of a
box=2 periodic cube, so no pair is ever x-wrapped and the fully-periodic
dense reference computes the same physics the mixed-periodicity block
grid must reproduce.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.sph_blocks import (build_block_lists,
                                                 density_adaptive_blocks,
                                                 hydro_force_blocks)
from gadget_leicester_tpu.ops.sph_dense import density_adaptive, hydro_force

BOX = 2.0
FINE = 0.5                  # uniform fine-cell edge
NB = (1, 2, 2)              # x: 1 block over [0.1, 1.1]; y/z: box/2Lf = 2
PER = (False, True, True)
ORIGIN = (0.1, 0.0, 0.0)
EXTENT = (2 * 1 * FINE, BOX, BOX)


def _setup(rng, n=2500):
    pos = np.stack([
        rng.uniform(0.2, 0.8, n),       # thin x-slab: no x-wrap pairs
        rng.uniform(0.0, BOX, n),
        rng.uniform(0.0, BOX, n),
    ], axis=-1).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    mass = np.full(n, 1.0 / n, np.float32)
    h = np.full(n, 0.22, np.float32)
    mask = np.ones(n, bool)
    mask[-5:] = False
    return (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(h), jnp.asarray(mask))


def test_block_lists_complete_aniso(rng):
    n = 600
    pos = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0, BOX, n),
                    rng.uniform(0, BOX, n)], -1).astype(np.float32)
    mask = np.ones(n, bool)
    mask[::5] = False
    cl_e, cl_o = build_block_lists(jnp.asarray(pos), jnp.asarray(mask),
                                   ORIGIN, EXTENT, n_blocks=NB,
                                   subcap=256, periodic=PER)
    assert cl_e.n_cells == NB and cl_o.n_cells == (2, 2, 2)
    for cl in (cl_e, cl_o):
        cells = np.asarray(cl.cells)
        idx = cells[cells >= 0]
        assert len(idx) == int(mask.sum())
        assert len(np.unique(idx)) == int(mask.sum())
        # gslot inverse map agrees with the packing
        gslot = np.asarray(cl.gslot)
        flat = cells.reshape(-1)
        for p in np.where(mask)[0][:50]:
            assert flat[gslot[p]] == p


@pytest.mark.parametrize("relative", [False, True])
def test_density_aniso_vs_dense(rng, relative):
    pos, vel, mass, h, mask = _setup(rng)
    max_hsml = (1.0 - 0.1) * FINE
    r1 = density_adaptive(pos, vel, mass, jnp.minimum(h, max_hsml), mask,
                          des_num_ngb=33.0, max_dev=2.0, box=BOX,
                          periodic=True)
    # the h cap must not bind, or the uncapped dense oracle diverges
    assert float(jnp.max(jnp.where(mask, r1.hsml, 0.0))) < max_hsml
    cls = build_block_lists(pos, mask, ORIGIN, EXTENT, n_blocks=NB,
                            subcap=256, periodic=PER)
    r2, _ = density_adaptive_blocks(
        pos, vel, mass, jnp.minimum(h, max_hsml), mask, des_num_ngb=33.0,
        max_dev=2.0, box=BOX, subcap=256, max_hsml=max_hsml,
        periodic=PER, cls=cls, interpret=True,
        fine_edge=FINE if relative else None)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(r1.rho)[m], np.asarray(r2.rho)[m],
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.hsml)[m],
                               np.asarray(r2.hsml)[m], rtol=5e-3)
    np.testing.assert_allclose(np.asarray(r1.div_vel)[m],
                               np.asarray(r2.div_vel)[m], rtol=1e-2,
                               atol=1e-4)


@pytest.mark.parametrize("relative", [False, True])
def test_hydro_aniso_vs_dense(rng, relative):
    pos, vel, mass, h, mask = _setup(rng)
    max_hsml = (1.0 - 0.1) * FINE
    cls = build_block_lists(pos, mask, ORIGIN, EXTENT, n_blocks=NB,
                            subcap=256, periodic=PER)
    dres, _ = density_adaptive_blocks(
        pos, vel, mass, jnp.minimum(h, max_hsml), mask, des_num_ngb=33.0,
        max_dev=2.0, box=BOX, subcap=256, max_hsml=max_hsml,
        periodic=PER, cls=cls, interpret=True,
        fine_edge=FINE if relative else None)
    rho = jnp.where(mask, dres.rho, 1.0)
    entropy = jnp.asarray(np.full(pos.shape[0], 0.8, np.float32))
    prs = entropy * rho ** (5.0 / 3.0)
    h1 = hydro_force(pos, vel, mass, dres.hsml, rho, prs,
                     dres.dhsml_factor, dres.div_vel, dres.curl_vel,
                     mask, visc_const=0.8, box=BOX, periodic=True)
    h2 = hydro_force_blocks(
        cls, pos, vel, mass, dres.hsml, rho, prs, dres.dhsml_factor,
        dres.div_vel, dres.curl_vel, mask, visc_const=0.8, box=BOX,
        interpret=True, fine_edge=FINE if relative else None)
    m = np.asarray(mask)
    scale = np.abs(np.asarray(h1.acc)[m]).max()
    np.testing.assert_allclose(np.asarray(h1.acc)[m] / scale,
                               np.asarray(h2.acc)[m] / scale,
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h1.max_signal_vel)[m],
                               np.asarray(h2.max_signal_vel)[m], rtol=1e-3)
