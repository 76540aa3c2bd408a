"""Cell-compacted active-ENTRY SPH density/hydro vs the dense block path
(docs/compact_active_design.md — the round-4 per-particle economy tier).

The entry variants [G2: density.c/hydra.c — only the active list gets
fresh sums] must reproduce the dense block kernels on active gas for
clustered, wrap-straddling, spread, spilled and empty activity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.pallas_cells import (ENTRY_LANES,
                                                   build_active_entries)
from gadget_leicester_tpu.ops.sph_blocks import (
    build_block_lists, count_block_entries, density_adaptive_blocks,
    density_adaptive_blocks_entries, hydro_force_blocks,
    hydro_force_blocks_entries)

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


def _lists(pos, gas_mask, periodic=True):
    return build_block_lists(pos, gas_mask, 0.0, BOX, n_blocks=NB,
                             subcap=SUBCAP, periodic=periodic)


def _active(mode, pos, gas_mask):
    n = pos.shape[0]
    if mode == "corner":
        return (pos[:, 0] < 0.35) & (pos[:, 1] < 0.35) & gas_mask
    if mode == "wrap":
        return (((pos[:, 0] > 0.85) | (pos[:, 0] < 0.15))
                & (pos[:, 1] < 0.4) & gas_mask)
    if mode == "spread":
        return (jnp.arange(n) % 37 == 0) & gas_mask
    if mode == "spill":
        return (pos[:, 0] < 0.5) & (pos[:, 1] < 0.25) & gas_mask
    return jnp.zeros(n, bool)


@pytest.mark.parametrize("mode", ["corner", "wrap", "spread", "spill",
                                  "empty"])
def test_entries_density_matches_dense(mode):
    pos, vel, mass, h0, gas_mask = _setup(5)
    cls = _lists(pos, gas_mask)
    active = _active(mode, pos, gas_mask)
    k_max = 4 * NB ** 3
    ec, es, total = build_active_entries(cls[0], active & gas_mask,
                                         ENTRY_LANES, k_max)
    assert int(total) <= k_max
    if not bool(cls[0].overflow):
        assert int(count_block_entries(cls[0], active & gas_mask,
                                       ENTRY_LANES)) == int(total)
    kw = dict(des_num_ngb=DES_NGB, max_dev=MAX_DEV, box=BOX,
              min_hsml=0.001, max_hsml=MAX_H, periodic=True,
              interpret=True)
    dres_d, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, n_blocks=NB, subcap=SUBCAP,
        active=active, cls=cls, **kw)
    dres_e = density_adaptive_blocks_entries(
        pos, vel, mass, h0, gas_mask, ec, es, cls=cls, **kw)
    a = np.asarray(active & gas_mask)
    for f in ("rho", "hsml", "dhsml_factor", "div_vel", "curl_vel",
              "num_ngb_eff"):
        np.testing.assert_allclose(
            np.asarray(getattr(dres_e, f))[a],
            np.asarray(getattr(dres_d, f))[a],
            rtol=2e-4, atol=2e-4, err_msg=f)
    if mode == "empty":
        assert float(jnp.max(jnp.abs(dres_e.rho))) == 0.0


@pytest.mark.parametrize("mode", ["corner", "spread"])
def test_entries_hydro_matches_dense(mode):
    pos, vel, mass, h0, gas_mask = _setup(7)
    cls = _lists(pos, gas_mask)
    active = _active(mode, pos, gas_mask)
    k_max = 4 * NB ** 3
    ec, es, _ = build_active_entries(cls[0], active & gas_mask,
                                     ENTRY_LANES, k_max)
    # full-active density first so every SOURCE has proper fields
    dres, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, des_num_ngb=DES_NGB,
        max_dev=MAX_DEV, box=BOX, n_blocks=NB, subcap=SUBCAP,
        min_hsml=0.001, max_hsml=MAX_H, periodic=True, interpret=True,
        active=None, cls=cls)
    pressure = jnp.where(gas_mask, 1.3 * dres.rho ** (5.0 / 3.0), 0.0)
    hkw = dict(visc_const=0.8, box=BOX, hubble_a2_flow=0.01,
               hubble_a2_norm=1.1, fac_mu=0.9, interpret=True)
    hres_d = hydro_force_blocks(
        cls, pos, vel, mass, dres.hsml, dres.rho, pressure,
        dres.dhsml_factor, dres.div_vel, dres.curl_vel, gas_mask,
        active=active, **hkw)
    hres_e = hydro_force_blocks_entries(
        cls, pos, vel, mass, dres.hsml, dres.rho, pressure,
        dres.dhsml_factor, dres.div_vel, dres.curl_vel, gas_mask,
        ec, es, **hkw)
    a = np.asarray(active & gas_mask)
    scale = np.abs(np.asarray(hres_d.acc)[a]).max() + 1e-30
    np.testing.assert_allclose(np.asarray(hres_e.acc)[a],
                               np.asarray(hres_d.acc)[a],
                               rtol=2e-4, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(hres_e.dt_entropy)[a],
                               np.asarray(hres_d.dt_entropy)[a],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hres_e.max_signal_vel)[a],
                               np.asarray(hres_d.max_signal_vel)[a],
                               rtol=2e-4, atol=2e-4)
    # inactive gas untouched
    assert float(jnp.max(jnp.abs(np.asarray(hres_e.acc)[~a]))) == 0.0


def test_entries_density_vacuum():
    """Non-periodic block grids: (nb+1)^3 odd layout, edge blocks exact."""
    pos, vel, mass, h0, gas_mask = _setup(11)
    cls = _lists(pos, gas_mask, periodic=False)
    active = ((pos[:, 0] < 0.2) | (pos[:, 0] > 0.8)) & gas_mask
    k_max = 512   # two ~800-target slabs need ~210 entries
    ec, es, total = build_active_entries(cls[0], active & gas_mask,
                                         ENTRY_LANES, k_max)
    assert int(total) <= k_max   # the dispatch contract the caller checks
    kw = dict(des_num_ngb=DES_NGB, max_dev=MAX_DEV, box=BOX,
              min_hsml=0.001, max_hsml=MAX_H, periodic=False,
              interpret=True)
    dres_d, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, n_blocks=NB, subcap=SUBCAP,
        active=active, cls=cls, **kw)
    dres_e = density_adaptive_blocks_entries(
        pos, vel, mass, h0, gas_mask, ec, es, cls=cls, **kw)
    a = np.asarray(active & gas_mask)
    np.testing.assert_allclose(np.asarray(dres_e.rho)[a],
                               np.asarray(dres_d.rho)[a],
                               rtol=2e-4, atol=2e-4)
