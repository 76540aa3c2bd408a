"""Sharded pencil-FFT PM vs the single-device PM oracle on the virtual
8-device CPU mesh (SURVEY.md §4 item 6: rank-count invariance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.ops.pm import pm_forces_periodic
from gadget_leicester_tpu.parallel.mesh import make_mesh
from gadget_leicester_tpu.parallel.pm_sharded import make_pm_sharded


@pytest.mark.parametrize("with_potential", [False, True])
def test_pm_sharded_matches_single_device(rng, with_potential):
    n_dev = 8
    mesh = make_mesh(n_dev)
    box, n = 4.0, 32
    npart = 4096
    pos = jnp.asarray(rng.uniform(0, box, (npart, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, npart), jnp.float32)
    alive = np.ones(npart, bool)
    alive[::13] = False
    alive = jnp.asarray(alive)

    ref = pm_forces_periodic(pos, mass, alive, box, n,
                             with_potential=with_potential)
    fn = make_pm_sharded(mesh, box, n, with_potential=with_potential)
    got = jax.jit(fn)(pos, mass, alive)

    if with_potential:
        ref_acc, ref_pot = ref
        got_acc, got_pot = got
    else:
        ref_acc, got_acc = ref, got

    scale = float(jnp.max(jnp.abs(ref_acc)))
    np.testing.assert_allclose(np.asarray(got_acc), np.asarray(ref_acc),
                               atol=2e-5 * scale, rtol=2e-4)
    if with_potential:
        pscale = float(jnp.max(jnp.abs(ref_pot)))
        np.testing.assert_allclose(np.asarray(got_pot), np.asarray(ref_pot),
                                   atol=2e-5 * pscale, rtol=2e-4)
