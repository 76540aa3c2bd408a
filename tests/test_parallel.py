"""Multi-device sharding tests on the 8-device virtual CPU mesh —
the rebuild analog of `mpirun -np K` invariance (SURVEY.md §4 item 6)."""

import numpy as np
import jax
import pytest

from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
from gadget_leicester_tpu.models.ics import gassphere_ics
from gadget_leicester_tpu.models.simulation import (init_state,
                                                    sync_point_step)
from gadget_leicester_tpu.parallel.mesh import make_mesh, shard_state
from gadget_leicester_tpu.parallel.step import make_sharded_step
from tests.test_config import GASSPHERE_PARAM


def _cfg():
    return parse_parameter_text(
        GASSPHERE_PARAM.replace("GravityConstantInternal  0",
                                "GravityConstantInternal  1.0"))


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device():
    cfg = _cfg()
    opts = SimOptions()
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    keep = np.arange(0, len(pos), 4)
    state = init_state(cfg, opts, pos[keep], vel[keep],
                       mass[keep] * len(pos) / len(keep), ptype[keep],
                       u=u[keep])
    # single-device trajectory
    s1 = state
    for _ in range(3):
        s1 = sync_point_step(s1, cfg, opts)
    # sharded trajectory over 8 devices
    mesh = make_mesh(8)
    step, s8 = make_sharded_step(state, cfg, opts, mesh)
    for _ in range(3):
        s8 = step(s8)
    np.testing.assert_allclose(np.asarray(s1.p.pos), np.asarray(s8.p.pos),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.p.vel), np.asarray(s8.p.vel),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.gas.entropy),
                               np.asarray(s8.gas.entropy), rtol=1e-4,
                               atol=1e-6)
    assert int(s1.ti_current) == int(s8.ti_current)


def test_graft_entry_single_chip():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.p.pos)
    assert out.p.pos.shape == args[0].p.pos.shape


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
