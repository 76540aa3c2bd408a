"""Restart bitwise invariance (SURVEY.md §4 item 5): a dump+resume run
must continue bit-identically to an uninterrupted one [G2: restart.c]."""

import numpy as np

from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
from gadget_leicester_tpu.io.restart import load_restart, save_restart
from gadget_leicester_tpu.models.ics import gassphere_ics
from gadget_leicester_tpu.models.simulation import init_state, sync_point_step
from tests.test_config import GASSPHERE_PARAM


def _cfg():
    return parse_parameter_text(
        GASSPHERE_PARAM.replace("GravityConstantInternal  0",
                                "GravityConstantInternal  1.0"))


def test_restart_bitwise_resume(tmp_path):
    cfg = _cfg()
    opts = SimOptions()
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    keep = np.arange(0, len(pos), 6)
    st = init_state(cfg, opts, pos[keep], vel[keep],
                    mass[keep] * len(pos) / len(keep), ptype[keep], u=u[keep])
    for _ in range(4):
        st = sync_point_step(st, cfg, opts)
    path = str(tmp_path / "restart_dump")
    save_restart(path, st, step_count=4)

    # continue the original
    cont = st
    for _ in range(3):
        cont = sync_point_step(cont, cfg, opts)

    # resume from dump and continue
    resumed, meta = load_restart(path)
    assert meta["step_count"] == 4
    for _ in range(3):
        resumed = sync_point_step(resumed, cfg, opts)

    # BITWISE identical
    np.testing.assert_array_equal(np.asarray(cont.p.pos),
                                  np.asarray(resumed.p.pos))
    np.testing.assert_array_equal(np.asarray(cont.p.vel),
                                  np.asarray(resumed.p.vel))
    np.testing.assert_array_equal(np.asarray(cont.gas.entropy),
                                  np.asarray(resumed.gas.entropy))
    np.testing.assert_array_equal(np.asarray(cont.p.ti_endstep),
                                  np.asarray(resumed.p.ti_endstep))
    assert int(cont.ti_current) == int(resumed.ti_current)


def test_snapshot_from_state_roundtrip(tmp_path):
    from gadget_leicester_tpu.io.snapshot import read_snapshot, write_snapshot
    from gadget_leicester_tpu.io.state_io import snapshot_from_state

    cfg = _cfg()
    opts = SimOptions()
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    keep = np.arange(0, len(pos), 6)
    st = init_state(cfg, opts, pos[keep], vel[keep],
                    mass[keep] * len(pos) / len(keep), ptype[keep], u=u[keep])
    snap = snapshot_from_state(st, cfg, opts)
    assert int(snap.header.npart[0]) == len(keep)
    path = str(tmp_path / "snap")
    write_snapshot(path, snap, fmt=2)
    back = read_snapshot(path)
    np.testing.assert_allclose(back.pos, snap.pos)
    assert back.u is not None and np.all(back.u > 0)
