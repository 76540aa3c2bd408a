"""Direct-summation gravity tests: two-body Newton, momentum conservation,
periodic minimum image, erfc truncation limits."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.gravity_direct import (direct_gravity,
                                                     shortrange_trunc)


def _run(pos, mass, soft, **kw):
    n = len(pos)
    alive = jnp.ones(n, bool)
    acc, pot = direct_gravity(
        jnp.asarray(pos, jnp.float32), jnp.asarray(mass, jnp.float32),
        jnp.asarray(soft, jnp.float32), alive, block=64, **kw)
    return np.asarray(acc), np.asarray(pot)


def test_two_body_newtonian():
    pos = np.array([[0.0, 0, 0], [2.0, 0, 0]])
    mass = np.array([3.0, 5.0])
    soft = np.array([0.01, 0.01])
    acc, pot = _run(pos, mass, soft)
    # acc excludes G; particle 0 pulled toward +x with m_j/r^2 = 5/4
    assert acc[0, 0] == pytest.approx(5.0 / 4.0, rel=1e-5)
    assert acc[1, 0] == pytest.approx(-3.0 / 4.0, rel=1e-5)
    assert pot[0] == pytest.approx(-5.0 / 2.0, rel=1e-5)
    assert pot[1] == pytest.approx(-3.0 / 2.0, rel=1e-5)


def test_momentum_conservation(rng):
    n = 200
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.5, 2.0, n)
    soft = np.full(n, 0.1)
    acc, _ = _run(pos, mass, soft)
    net = (mass[:, None] * acc).sum(axis=0)
    scale = np.abs(mass[:, None] * acc).sum()
    assert np.all(np.abs(net) < 1e-5 * scale)


def test_softening_symmetrisation_preserves_newton3(rng):
    n = 50
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.5, 2.0, n)
    soft = rng.uniform(0.05, 0.8, n)  # unequal softenings
    acc, _ = _run(pos, mass, soft)
    net = (mass[:, None] * acc).sum(axis=0)
    scale = np.abs(mass[:, None] * acc).sum()
    assert np.all(np.abs(net) < 1e-5 * scale)


def test_dead_particles_excluded():
    pos = np.array([[0.0, 0, 0], [1.0, 0, 0], [0.5, 0.5, 0]])
    mass = np.array([1.0, 1.0, 100.0])
    soft = np.full(3, 0.01)
    alive = jnp.asarray([True, True, False])
    acc, _ = direct_gravity(
        jnp.asarray(pos, jnp.float32), jnp.asarray(mass, jnp.float32),
        jnp.asarray(soft, jnp.float32), alive, block=64)
    acc = np.asarray(acc)
    # dead particle exerts and receives no force
    assert acc[0, 0] == pytest.approx(1.0, rel=1e-5)
    assert np.all(acc[2] == 0.0)


def test_periodic_minimum_image():
    box = 10.0
    pos = np.array([[0.5, 5, 5], [9.5, 5, 5]])  # 1 apart across the wrap
    mass = np.array([1.0, 1.0])
    soft = np.full(2, 0.01)
    acc, _ = _run(pos, mass, soft, periodic=True, box=box)
    # particle 0 is pulled in -x (toward the image at -0.5)
    assert acc[0, 0] == pytest.approx(-1.0, rel=1e-5)


def test_shortrange_truncation_limits():
    asmth = 1.25
    assert float(shortrange_trunc(jnp.asarray(1e-4), asmth)) == pytest.approx(1.0, abs=1e-5)
    assert float(shortrange_trunc(jnp.asarray(10.0 * asmth), asmth)) < 1e-6


def test_block_edges(rng):
    """Results independent of block size (padding correctness)."""
    n = 77  # deliberately not a multiple of any block
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.5, 2.0, n)
    soft = np.full(n, 0.05)
    alive = jnp.ones(n, bool)
    a1, p1 = direct_gravity(jnp.asarray(pos, jnp.float32),
                            jnp.asarray(mass, jnp.float32),
                            jnp.asarray(soft, jnp.float32), alive, block=16)
    a2, p2 = direct_gravity(jnp.asarray(pos, jnp.float32),
                            jnp.asarray(mass, jnp.float32),
                            jnp.asarray(soft, jnp.float32), alive, block=128)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5)
