"""Barnes-Hut tree vs direct summation — the rebuild of the reference's
FORCETEST oracle [G2: gravtree_forcetest.c] (SURVEY.md §4 item 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.gravity_direct import direct_gravity
from gadget_leicester_tpu.ops.tree import build_octree, morton_keys, tree_gravity


def _plummer_cloud(rng, n):
    from gadget_leicester_tpu.models.ics import plummer_ics
    pos, vel, mass, ptype, _ = plummer_ics(n, seed=int(rng.integers(1e6)))
    return pos.astype(np.float32), mass.astype(np.float32)


def test_morton_keys_nesting():
    pos = jnp.asarray([[0.1, 0.1, 0.1], [0.12, 0.11, 0.13], [0.9, 0.9, 0.9]],
                      jnp.float32)
    k = morton_keys(pos, jnp.zeros(3), jnp.asarray(1.0), 10)
    # close points share a coarse prefix; far ones don't
    assert int(k[0]) >> 24 == int(k[1]) >> 24
    assert int(k[0]) >> 24 != int(k[2]) >> 24


def test_octree_mass_and_com(rng):
    n = 500
    pos, mass = _plummer_cloud(rng, n)
    alive = np.ones(n, bool)
    alive[-7:] = False
    tree = build_octree(jnp.asarray(pos), jnp.asarray(mass),
                        jnp.full(n, 0.05, jnp.float32), jnp.asarray(alive),
                        depth=6)
    m_tot = mass[alive].sum()
    com_tot = (mass[alive, None] * pos[alive]).sum(0) / m_tot
    for lvl in range(tree.depth):
        assert float(tree.mass[lvl].sum()) == pytest.approx(m_tot, rel=1e-5)
        cw = np.asarray(tree.mass[lvl][:, None] * tree.com[lvl]).sum(0) / m_tot
        np.testing.assert_allclose(cw, com_tot, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("opening", [0, 1])
def test_tree_vs_direct(rng, opening):
    n = 1500
    pos, mass = _plummer_cloud(rng, n)
    soft = np.full(n, 0.05, np.float32)
    alive = jnp.ones(n, bool)
    posj, massj, softj = map(jnp.asarray, (pos, mass, soft))
    acc_d, pot_d = direct_gravity(posj, massj, softj, alive, block=256)
    old_acc = jnp.sqrt(jnp.sum(jnp.asarray(acc_d) ** 2, -1))
    acc_t, pot_t = tree_gravity(posj, massj, softj, alive, theta=0.5,
                                opening=opening, old_acc=old_acc, depth=8)
    acc_d, acc_t = np.asarray(acc_d), np.asarray(acc_t)
    amag = np.linalg.norm(acc_d, axis=1)
    err = np.linalg.norm(acc_t - acc_d, axis=1) / np.maximum(amag, 1e-10)
    # GADGET-style accuracy: 99th percentile relative force error < 1%
    assert np.quantile(err, 0.99) < 1e-2, np.quantile(err, [0.5, 0.9, 0.99])
    assert np.median(err) < 2e-3
    # potential similar accuracy
    perr = np.abs(np.asarray(pot_t) - np.asarray(pot_d)) / np.abs(pot_d).max()
    assert np.quantile(perr, 0.99) < 1e-2


def test_tree_momentum_conservation(rng):
    n = 800
    pos, mass = _plummer_cloud(rng, n)
    soft = jnp.full(n, 0.05, jnp.float32)
    alive = jnp.ones(n, bool)
    acc, _ = tree_gravity(jnp.asarray(pos), jnp.asarray(mass), soft, alive,
                          theta=0.4, opening=0, depth=8)
    acc = np.asarray(acc)
    net = (mass[:, None] * acc).sum(0)
    scale = np.abs(mass[:, None] * acc).sum()
    # tree forces are not exactly antisymmetric (monopole acceptance is
    # one-sided) — the residual must still be tiny
    assert np.all(np.abs(net) < 2e-3 * scale)


def test_tree_dead_particles(rng):
    n = 300
    pos, mass = _plummer_cloud(rng, n)
    soft = jnp.full(n, 0.05, jnp.float32)
    alive = np.ones(n, bool)
    alive[::3] = False
    accA, _ = tree_gravity(jnp.asarray(pos), jnp.asarray(mass), soft,
                           jnp.asarray(alive), theta=0.4, opening=0, depth=7)
    acc_live, _ = tree_gravity(jnp.asarray(pos[alive]),
                               jnp.asarray(mass[alive]),
                               jnp.full(int(alive.sum()), 0.05, jnp.float32),
                               jnp.ones(int(alive.sum()), bool),
                               theta=0.4, opening=0, depth=7)
    np.testing.assert_allclose(np.asarray(accA)[alive], np.asarray(acc_live),
                               rtol=2e-2, atol=1e-4)
    assert np.all(np.asarray(accA)[~alive] == 0.0)


def test_tree_periodic_ewald(rng):
    """Ewald-corrected periodic tree vs the exact periodic oracle
    [G2: ewald correction + forcetest]."""
    from gadget_leicester_tpu.ops.ewald import direct_periodic_forces
    n, box = 300, 1.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n)
    soft = jnp.full(n, 0.004, jnp.float32)
    alive = jnp.ones(n, bool)
    acc_t, _ = tree_gravity(jnp.asarray(pos), jnp.asarray(mass, jnp.float32),
                            soft, alive, theta=0.3, opening=0, depth=6,
                            periodic=True, box=box)
    oracle = direct_periodic_forces(pos.astype(np.float64), mass, box)
    acc_t = np.asarray(acc_t)
    scale = np.abs(oracle).max()
    err = np.linalg.norm(acc_t - oracle, axis=1) / scale
    assert np.quantile(err, 0.95) < 2e-2, np.quantile(err, [0.5, 0.95, 1.0])
    assert np.median(err) < 5e-3
