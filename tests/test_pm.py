"""PM gravity + TreePM split tests vs the Ewald periodic oracle
(SURVEY.md §4: FFT Green's function vs analytic; §7 step 7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.ewald import (direct_periodic_forces,
                                            ewald_pair_force)
from gadget_leicester_tpu.ops.gravity_direct import direct_gravity
from gadget_leicester_tpu.ops.pm import (ASMTH, RCUT, cic_deposit, cic_gather,
                                         pm_forces_periodic)


def test_cic_deposit_conserves_mass(rng):
    n, g, box = 500, 16, 2.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    grid = cic_deposit(pos, mass, box, g)
    assert float(grid.sum()) == pytest.approx(float(mass.sum()), rel=1e-5)


def test_cic_partition_of_unity(rng):
    """Gathering a constant field returns the constant exactly."""
    g, box = 8, 1.0
    pos = jnp.asarray(rng.uniform(0, box, (100, 3)), jnp.float32)
    field = jnp.full((g, g, g), 3.25, jnp.float32)
    vals = cic_gather(field, pos, box, g)
    np.testing.assert_allclose(np.asarray(vals), 3.25, rtol=1e-6)


def test_ewald_alpha_independence(rng):
    """The Ewald split must be independent of the splitting parameter."""
    box = 1.0
    r = rng.uniform(0.1, 0.9, (20, 3))
    f1 = ewald_pair_force(r, box, alpha=2.0 / box)
    f2 = ewald_pair_force(r, box, alpha=3.0 / box, nmax=5, kmax=6)
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-7)


def test_ewald_symmetric_point_zero_force():
    """Two particles separated by L/2 along an axis: image symmetry =>
    exactly zero net force."""
    box = 1.0
    f = ewald_pair_force(np.array([[0.5, 0.0, 0.0]]), box)
    assert np.all(np.abs(f) < 1e-10)


def test_ewald_short_distance_is_newtonian():
    box = 1.0
    r = np.array([[0.01, 0.0, 0.0]])
    f = ewald_pair_force(r, box)
    # f -> -r/|r|^3 = -1e4 in x
    assert f[0, 0] == pytest.approx(-1e4, rel=1e-3)


@pytest.mark.parametrize("gradient", ["fd4", "spectral"])
def test_treepm_matches_ewald(rng, gradient):
    """PM long-range + erfc short-range == exact periodic force.
    This is the rebuild of the FORCETEST oracle for the TreePM stack."""
    n, box, g = 24, 1.0, 32
    pos = rng.uniform(0, box, (n, 3))
    # enforce minimum separation so the unsoftened oracle is well-conditioned
    mass = rng.uniform(0.5, 1.5, n)
    posj = jnp.asarray(pos, jnp.float32)
    massj = jnp.asarray(mass, jnp.float32)
    alive = jnp.ones(n, bool)
    soft = jnp.full(n, 1e-4, jnp.float32)

    asmth_len = ASMTH * box / g
    rcut = RCUT * asmth_len
    acc_pm = pm_forces_periodic(posj, massj, alive, box, g, gradient=gradient)
    acc_sr, _ = direct_gravity(posj, massj, soft, alive, box=box,
                               asmth=asmth_len, rcut=rcut, periodic=True,
                               block=32)
    total = np.asarray(acc_pm) + np.asarray(acc_sr)
    oracle = direct_periodic_forces(pos, mass, box)
    # typical TreePM accuracy ~1e-3 relative [Springel 2005 fig. 2-3 scale]
    scale = np.abs(oracle).max()
    err = np.abs(total - oracle).max() / scale
    assert err < 2e-2, f"TreePM vs Ewald max rel err {err}"
    # rms error much tighter
    rms = np.sqrt(((total - oracle) ** 2).mean()) / scale
    assert rms < 5e-3, f"TreePM vs Ewald rms err {rms}"


def test_pm_momentum_conservation(rng):
    n, box, g = 100, 1.0, 32
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n), jnp.float32)
    alive = jnp.ones(n, bool)
    acc = np.asarray(pm_forces_periodic(pos, mass, alive, box, g))
    net = (np.asarray(mass)[:, None] * acc).sum(0)
    scale = np.abs(np.asarray(mass)[:, None] * acc).sum()
    assert np.all(np.abs(net) < 2e-4 * scale)


def test_pm_uniform_grid_zero_force():
    """A perfectly uniform particle grid has (near-)zero PM force."""
    g, box = 16, 1.0
    side = 8
    x = (np.arange(side) + 0.5) / side * box
    pos = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1).reshape(-1, 3)
    n = len(pos)
    acc = np.asarray(pm_forces_periodic(
        jnp.asarray(pos, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool), box, g))
    # characteristic acceleration of one neighbour at spacing d:
    char = 1.0 / (box / side) ** 2
    assert np.abs(acc).max() < 1e-3 * char


def test_pm_nonperiodic_matches_newton(rng):
    """Vacuum PM (zero-padded) + erfc short-range == Newton for an
    isolated particle set [G2: pm_nonperiodic.c]."""
    from gadget_leicester_tpu.ops.pm import pm_forces_nonperiodic
    n, ext, g = 64, 10.0, 32
    pos = rng.uniform(2.0, 8.0, (n, 3))   # interior of the region
    mass = rng.uniform(0.5, 1.5, n)
    posj = jnp.asarray(pos, jnp.float32)
    massj = jnp.asarray(mass, jnp.float32)
    alive = jnp.ones(n, bool)
    soft = jnp.full(n, 1e-3, jnp.float32)
    asmth_len = ASMTH * ext / g
    rcut = RCUT * asmth_len
    acc_pm = np.asarray(pm_forces_nonperiodic(posj, massj, alive, 0.0, ext, g))
    acc_sr, _ = direct_gravity(posj, massj, soft, alive, asmth=asmth_len,
                               rcut=rcut, periodic=False, block=64)
    total = acc_pm + np.asarray(acc_sr)
    # exact Newtonian oracle
    dx = pos[:, None, :] - pos[None, :, :]
    r = np.linalg.norm(dx, axis=-1)
    np.fill_diagonal(r, 1.0)
    fac = mass[None, :] / r**3
    np.fill_diagonal(fac, 0.0)
    exact = -(fac[:, :, None] * dx).sum(axis=1)
    scale = np.abs(exact).max()
    err = np.abs(total - exact).max() / scale
    rms = np.sqrt(((total - exact) ** 2).mean()) / scale
    assert rms < 5e-3, rms
    assert err < 3e-2, err
