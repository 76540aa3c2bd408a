"""Sparse (compacted active-tile) SPH density/hydro vs the dense path.

The sparse variants [G2: density.c/hydra.c — only the active list gets
fresh sums] must reproduce the dense block kernels' results exactly on
active gas for clustered activity patterns, including activity across
the periodic wrap and empty active sets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gadget_leicester_tpu.ops.sph_blocks import (
    _needed_odd, build_block_lists, density_adaptive_blocks,
    density_adaptive_blocks_sparse, hydro_force_blocks,
    hydro_force_blocks_sparse, sph_block_flags)

BOX = 1.0
NB = 3
SUBCAP = 64
DES_NGB = 33.0
MAX_DEV = 2.0


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


def _lists(pos, gas_mask):
    return build_block_lists(pos, gas_mask, 0.0, BOX, n_blocks=NB,
                             subcap=SUBCAP, periodic=True)


def _active(mode, pos, gas_mask):
    if mode == "corner":
        return (pos[:, 0] < 0.35) & (pos[:, 1] < 0.35) & gas_mask
    if mode == "wrap":
        return (((pos[:, 0] > 0.85) | (pos[:, 0] < 0.15))
                & (pos[:, 1] < 0.4) & gas_mask)
    return jnp.zeros(pos.shape[0], bool)


MAX_H = (1.0 - 2 * 0.05) * BOX / (2 * NB)


@pytest.mark.parametrize("mode", ["corner", "wrap", "empty"])
def test_sparse_density_matches_dense(mode):
    pos, vel, mass, h0, gas_mask = _setup(5)
    cls = _lists(pos, gas_mask)
    active = _active(mode, pos, gas_mask)
    flags_e = sph_block_flags(cls[0], active & gas_mask)
    b3 = NB ** 3
    kw = dict(des_num_ngb=DES_NGB, max_dev=MAX_DEV, box=BOX,
              min_hsml=0.001, max_hsml=MAX_H, periodic=True,
              interpret=True)
    dres_d, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, n_blocks=NB, subcap=SUBCAP,
        active=active, cls=cls, **kw)
    dres_s = density_adaptive_blocks_sparse(
        pos, vel, mass, h0, gas_mask, active, flags_e,
        k_act=b3, k_pack=b3, cls=cls, **kw)
    a = np.asarray(active & gas_mask)
    for f in ("rho", "hsml", "dhsml_factor", "div_vel", "curl_vel",
              "num_ngb_eff"):
        np.testing.assert_allclose(
            np.asarray(getattr(dres_s, f))[a],
            np.asarray(getattr(dres_d, f))[a],
            rtol=2e-5, atol=2e-5, err_msg=f)
    if mode == "empty":
        assert float(jnp.max(jnp.abs(dres_s.rho))) == 0.0


def test_sparse_hydro_matches_dense():
    pos, vel, mass, h0, gas_mask = _setup(7)
    cls = _lists(pos, gas_mask)
    active = _active("corner", pos, gas_mask)
    flags_e = sph_block_flags(cls[0], active & gas_mask)
    b3 = NB ** 3
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
    hres_s = hydro_force_blocks_sparse(
        cls, pos, vel, mass, dres.hsml, dres.rho, pressure,
        dres.dhsml_factor, dres.div_vel, dres.curl_vel, gas_mask,
        flags_e, k_act=b3, k_pack=b3, **hkw)
    a = np.asarray(active & gas_mask)
    np.testing.assert_allclose(np.asarray(hres_s.acc)[a],
                               np.asarray(hres_d.acc)[a],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hres_s.dt_entropy)[a],
                               np.asarray(hres_d.dt_entropy)[a],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hres_s.max_signal_vel)[a],
                               np.asarray(hres_d.max_signal_vel)[a],
                               rtol=2e-5, atol=2e-5)


def test_sparse_density_tight_capacities():
    """k_act/k_pack sized exactly to the activity pattern still exact."""
    pos, vel, mass, h0, gas_mask = _setup(11)
    cls = _lists(pos, gas_mask)
    active = (pos[:, 0] < 0.3) & (pos[:, 1] < 0.3) & (pos[:, 2] < 0.3) \
        & gas_mask
    flags_e = sph_block_flags(cls[0], active & gas_mask)
    needed = _needed_odd(flags_e > 0, NB, True)
    k_act = int(jnp.sum(flags_e > 0))
    k_pack = int(jnp.sum(needed))
    assert 1 <= k_act < NB ** 3
    kw = dict(des_num_ngb=DES_NGB, max_dev=MAX_DEV, box=BOX,
              min_hsml=0.001, max_hsml=MAX_H, periodic=True,
              interpret=True)
    dres_d, _ = density_adaptive_blocks(
        pos, vel, mass, h0, gas_mask, n_blocks=NB, subcap=SUBCAP,
        active=active, cls=cls, **kw)
    dres_s = density_adaptive_blocks_sparse(
        pos, vel, mass, h0, gas_mask, active, flags_e,
        k_act=k_act, k_pack=k_pack, cls=cls, **kw)
    a = np.asarray(active & gas_mask)
    np.testing.assert_allclose(np.asarray(dres_s.rho)[a],
                               np.asarray(dres_d.rho)[a],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dres_s.hsml)[a],
                               np.asarray(dres_d.hsml)[a],
                               rtol=2e-5, atol=2e-5)
