"""Per-particle compacted-active force paths vs the dense backends.

The compact tier [G2: gravtree.c / density.c — work follows the active
list] evaluates only the listed target rows against the cached grids;
it must reproduce the dense results on active rows (exactly for gravity
— same pair math, same candidate sets — and to fp tolerance for the
SPH block kernels, whose summation order differs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.gravity_short import (
    shortrange_gravity_cells, shortrange_gravity_cells_ids)
from gadget_leicester_tpu.ops.neighbors import build_cell_list
from gadget_leicester_tpu.ops.sph_blocks import (
    build_block_lists, density_adaptive_blocks, fine_candidate_indices,
    hydro_force_blocks)
from gadget_leicester_tpu.ops.sph_cells import (density_adaptive_cells_ids,
                                                hydro_force_cells_ids)

BOX = 1.0
NB = 3
SUBCAP = 64
DES_NGB = 33.0
MAX_DEV = 2.0
MAX_H = (1.0 - 2 * 0.05) * BOX / (2 * NB)


def _setup(seed, n=4000):
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 3)).astype(np.float32) * BOX
    vel = (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.3
    mass = np.full(n, 1.0 / n, np.float32)
    gas_mask = np.ones(n, bool)
    gas_mask[-9:] = False
    h0 = np.full(n, 0.12, np.float32)
    return (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            jnp.asarray(h0), jnp.asarray(gas_mask))


def _active(mode, pos, gas_mask):
    if mode == "corner":
        return (pos[:, 0] < 0.35) & (pos[:, 1] < 0.35) & gas_mask
    if mode == "wrap":
        return (((pos[:, 0] > 0.85) | (pos[:, 0] < 0.15))
                & (pos[:, 1] < 0.4) & gas_mask)
    return jnp.zeros(pos.shape[0], bool)


@pytest.mark.parametrize("with_pot", [False, True])
def test_compact_gravity_matches_dense(with_pot):
    pos, vel, mass, h0, alive = _setup(3)
    soft = jnp.full(pos.shape[0], 0.02, jnp.float32)
    asmth, rcut = 0.1, 0.45
    cl = build_cell_list(pos, alive, 0.0, BOX, n_cells=4, capacity=128,
                        periodic=True)
    active = _active("wrap", pos, alive)
    k = 512
    ids = jnp.nonzero(active, size=k, fill_value=-1)[0].astype(jnp.int32)
    dense = shortrange_gravity_cells(
        cl, pos, mass, soft, alive, asmth, rcut, box=BOX, periodic=True,
        with_potential=with_pot)
    compact = shortrange_gravity_cells_ids(
        cl, pos, mass, soft, alive, ids, asmth, rcut, box=BOX,
        periodic=True, with_potential=with_pot)
    a = np.asarray(active)
    if with_pot:
        acc_d, pot_d = dense
        acc_c, pot_c = compact
        np.testing.assert_allclose(np.asarray(pot_c)[a],
                                   np.asarray(pot_d)[a], rtol=1e-6)
        assert np.all(np.asarray(pot_c)[~a] == 0.0)
    else:
        acc_d, acc_c = dense, compact
    # same pair math + candidate sets; XLA may reassociate the reductions
    ascale = float(np.max(np.abs(np.asarray(acc_d))))
    np.testing.assert_allclose(np.asarray(acc_c)[a],
                               np.asarray(acc_d)[a], rtol=1e-4,
                               atol=1e-5 * ascale)
    assert np.all(np.asarray(acc_c)[~a] == 0.0)


@pytest.mark.parametrize("mode", ["corner", "wrap", "empty"])
def test_compact_density_matches_dense_blocks(mode):
    pos, vel, mass, h0, gas_mask = _setup(5)
    cls = build_block_lists(pos, gas_mask, 0.0, BOX, n_blocks=NB,
                            subcap=SUBCAP, periodic=True)
    active = _active(mode, pos, gas_mask)
    kw = dict(des_num_ngb=DES_NGB, max_dev=MAX_DEV, box=BOX,
              min_hsml=0.001, max_hsml=MAX_H, periodic=True)
    dres_d, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, n_blocks=NB, subcap=SUBCAP,
        active=active, cls=cls, interpret=True, **kw)
    ids = jnp.nonzero(active & gas_mask, size=1024,
                      fill_value=-1)[0].astype(jnp.int32)
    from functools import partial
    dres_c = density_adaptive_cells_ids(
        cls[0], pos, vel, mass, h0, gas_mask, ids,
        candidates_fn=partial(fine_candidate_indices, cls[0]), **kw)
    a = np.asarray(active & gas_mask)
    for f in ("rho", "hsml", "dhsml_factor", "div_vel", "curl_vel",
              "num_ngb_eff"):
        np.testing.assert_allclose(
            np.asarray(getattr(dres_c, f))[a],
            np.asarray(getattr(dres_d, f))[a],
            rtol=2e-5, atol=2e-5, err_msg=f)
    if mode == "empty":
        assert float(jnp.max(jnp.abs(dres_c.rho))) == 0.0


def test_compact_hydro_matches_dense_blocks():
    pos, vel, mass, h0, gas_mask = _setup(7)
    cls = build_block_lists(pos, gas_mask, 0.0, BOX, n_blocks=NB,
                            subcap=SUBCAP, periodic=True)
    active = _active("corner", pos, gas_mask)
    dres, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, des_num_ngb=DES_NGB,
        max_dev=MAX_DEV, box=BOX, n_blocks=NB, subcap=SUBCAP,
        min_hsml=0.001, max_hsml=MAX_H, periodic=True, interpret=True,
        active=None, cls=cls)
    pressure = jnp.where(gas_mask, 1.3 * dres.rho ** (5.0 / 3.0), 0.0)
    hkw = dict(visc_const=0.8, box=BOX, hubble_a2_flow=0.01,
               hubble_a2_norm=1.1, fac_mu=0.9)
    hres_d = hydro_force_blocks(
        cls, pos, vel, mass, dres.hsml, dres.rho, pressure,
        dres.dhsml_factor, dres.div_vel, dres.curl_vel, gas_mask,
        active=active, interpret=True, **hkw)
    ids = jnp.nonzero(active & gas_mask, size=1024,
                      fill_value=-1)[0].astype(jnp.int32)
    from functools import partial
    hres_c = hydro_force_cells_ids(
        cls[0], pos, vel, mass, dres.hsml, dres.rho, pressure,
        dres.dhsml_factor, dres.div_vel, dres.curl_vel, gas_mask, ids,
        periodic=True,
        candidates_fn=partial(fine_candidate_indices, cls[0]), **hkw)
    a = np.asarray(active & gas_mask)
    np.testing.assert_allclose(np.asarray(hres_c.acc)[a],
                               np.asarray(hres_d.acc)[a],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hres_c.dt_entropy)[a],
                               np.asarray(hres_d.dt_entropy)[a],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hres_c.max_signal_vel)[a],
                               np.asarray(hres_d.max_signal_vel)[a],
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(hres_c.acc)[~a] == 0.0)
