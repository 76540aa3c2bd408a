"""Pallas kernels inside the SPMD slab step (VERDICT r3 item 5): the
anisotropic cell grids (clamped x, periodic y/z) must run the SAME
Pallas kernels as the single-chip hot path [G2: the reference's MPI
ranks run the same force loops as serial]. On the CPU test mesh the
kernels execute in interpret mode; numbers must match the jnp cells
backend the SPMD step used before."""

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
from gadget_leicester_tpu.models.ics import lcdm_gas_ics
from gadget_leicester_tpu.parallel.mesh import make_mesh
from gadget_leicester_tpu.parallel.spmd import (make_spmd_step,
                                                spmd_min_width, to_spmd)

BOX = 50000.0
PARAM = f"""
InitCondFile x
OutputDir  /tmp/spmd_pallas_test
TimeBegin  0.090909
TimeMax    1.0
ComovingIntegrationOn 1
PeriodicBoundariesOn 1
BoxSize    {BOX}
Omega0     0.3
OmegaLambda 0.7
OmegaBaryon 0.04
HubbleParam 0.7
ErrTolIntAccuracy 0.025
MaxSizeTimestep 0.02
CourantFac 0.15
DesNumNgb 33
MaxNumNgbDeviation 2
ArtBulkViscConst 0.8
InitGasTemp 1000
MinGasTemp 5
SofteningGas  100
SofteningHalo 100
SofteningGasMaxPhys  100
SofteningHaloMaxPhys 100
MinGasHsmlFractional 0.1
"""


def _run_spmd(opts, n_steps=2, n_side=16, n_dev=4):
    cfg = parse_parameter_text(PARAM)
    from gadget_leicester_tpu.models.simulation import Simulation
    # ICs/init always through the jnp path (single-chip "on" would run
    # compiled Pallas on the CPU test backend); only the SPMD step under
    # test uses ``opts``
    import dataclasses
    sim = Simulation(cfg, dataclasses.replace(opts, use_pallas="off"))
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=BOX, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    mesh = make_mesh(n_dev)
    mw = spmd_min_width(cfg, opts, sim.state.gas.n_gas_max)
    st, _, edges = to_spmd(sim.state, mesh, cfg, min_width=mw)
    step = make_spmd_step(cfg, opts, mesh, edges=edges)(st)
    for _ in range(n_steps):
        st = step(st)
    return st


def _by_pid(state):
    alive = np.asarray(state.p.alive)
    pid = np.asarray(state.p.pid)[alive]
    order = np.argsort(pid)
    return (pid[order],
            np.asarray(state.p.pos)[alive][order],
            np.asarray(state.p.vel)[alive][order],
            np.asarray(state.p.acc)[alive][order])


@pytest.mark.slow
def test_spmd_pallas_matches_jnp_backend():
    """Same decomposition, same steps: Pallas (interpret) vs jnp cells."""
    base = dict(periodic=True, pmgrid=24, gravity_mode="treepm",
                sph_backend="cells")
    ref = _run_spmd(SimOptions(**base, use_pallas="off"))
    got = _run_spmd(SimOptions(**base, use_pallas="on"))
    assert int(got.overflow_flags) == 0
    assert int(got.ti_current) == int(ref.ti_current)

    pid_r, pos_r, vel_r, acc_r = _by_pid(ref)
    pid_g, pos_g, vel_g, acc_g = _by_pid(got)
    np.testing.assert_array_equal(pid_r, pid_g)
    dpos = pos_r - pos_g
    dpos -= BOX * np.round(dpos / BOX)
    assert np.max(np.abs(dpos)) / (BOX / 16) < 2e-4, np.max(np.abs(dpos))
    vs = max(np.max(np.abs(vel_r)), 1e-30)
    np.testing.assert_allclose(vel_g, vel_r, atol=2e-4 * vs, rtol=0)
    asc = max(np.max(np.abs(acc_r)), 1e-30)
    np.testing.assert_allclose(acc_g, acc_r, atol=2e-4 * asc, rtol=0)


def test_anisotropic_gravity_kernel_parity(rng):
    """shortrange_gravity_pallas_dma9 on an anisotropic clamped-x grid
    (the SPMD slab geometry) vs the jnp cells backend on the same cell
    list — standalone, no mesh."""
    from gadget_leicester_tpu.ops.gravity_short import \
        shortrange_gravity_cells
    from gadget_leicester_tpu.ops.neighbors import build_cell_list
    from gadget_leicester_tpu.ops.pallas_cells import \
        shortrange_gravity_pallas_dma9

    box = 1.0
    n = 160
    # slab frame: x in [-0.15, 0.45) (clamped, 3 cells of 0.2);
    # y/z in [0, 1) periodic, 5 cells
    pos = np.stack([rng.uniform(-0.15, 0.45, n),
                    rng.uniform(0, box, n),
                    rng.uniform(0, box, n)], axis=1).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    soft = np.full(n, 0.02, np.float32)
    alive = np.ones(n, bool)
    ncv = (3, 5, 5)
    per = (False, True, True)
    cl = build_cell_list(jnp.asarray(pos), jnp.asarray(alive),
                         origin=jnp.asarray([-0.15, 0.0, 0.0], jnp.float32),
                         extent=jnp.asarray([0.6, 1.0, 1.0], jnp.float32),
                         n_cells=ncv, capacity=128, periodic=per)
    asmth, rcut = 0.05, 0.19
    acc_ref, pot_ref = shortrange_gravity_cells(
        cl, jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(soft),
        jnp.asarray(alive), asmth, rcut, box=box, periodic=True,
        with_potential=True)
    acc, pot, ovf = shortrange_gravity_pallas_dma9(
        jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(soft),
        jnp.asarray(alive), box=box, n_cells=ncv, capacity=128,
        asmth=asmth, rcut=rcut, periodic=per, cl=cl,
        with_potential=True, interpret=True)
    assert not bool(ovf)
    scale = np.max(np.abs(np.asarray(acc_ref)))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref),
                               atol=3e-4 * scale, rtol=0)
    ps = np.max(np.abs(np.asarray(pot_ref)))
    np.testing.assert_allclose(np.asarray(pot), np.asarray(pot_ref),
                               atol=3e-4 * ps, rtol=0)
