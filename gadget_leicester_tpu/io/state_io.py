"""SimState <-> snapshot conversion with GADGET unit conventions.

Velocity conventions [G2: read_ic.c / io.c]:
* snapshot/IC files store v_file = v_peculiar / sqrt(a)  (comoving runs)
* the internal integration variable is vel = a * v_peculiar
  (so that x_comoving += vel * int dt/a^2 drifts correctly)
* => vel = v_file * a^{3/2} on read; v_file = vel / a^{3/2} on write.
Physical runs: vel = v_file.
"""

from __future__ import annotations

import numpy as np

from gadget_leicester_tpu.core.config import (GAMMA_MINUS1, SimConfig,
                                              SimOptions)
from gadget_leicester_tpu.core.state import SimState
from gadget_leicester_tpu.core import timeline
from gadget_leicester_tpu.io.snapshot import Header, SnapshotData


def snapshot_from_state(state: SimState, cfg: SimConfig,
                        opts: SimOptions,
                        with_potential: bool = False) -> SnapshotData:
    """Host-side export of the live state as a GADGET snapshot
    [G2: io.c :: savepositions()/fill_write_buffer()]."""
    alive = np.asarray(state.p.alive)
    ptype = np.asarray(state.p.ptype)
    ng = state.gas.n_gas_max
    a_now = float(timeline.ti_to_time(state.ti_current, cfg))

    order = np.argsort(ptype[alive], kind="stable")  # types 0..5 file order
    idx = np.where(alive)[0][order]

    pos = np.asarray(state.p.pos)[idx]
    vel = np.asarray(state.p.vel)[idx]
    if cfg.comoving_integration_on:
        vel = vel / a_now**1.5
    mass = np.asarray(state.p.mass)[idx]
    ids = np.asarray(state.p.pid)[idx].astype(np.uint32)

    npart = np.zeros(6, np.uint32)
    for t in range(6):
        npart[t] = int((ptype[idx] == t).sum())
    h = Header()
    h.npart = npart
    h.npart_total = npart.copy()
    h.time = a_now
    h.redshift = 1.0 / a_now - 1.0 if cfg.comoving_integration_on else 0.0
    h.box_size = cfg.box_size
    h.omega0 = cfg.omega0
    h.omega_lambda = cfg.omega_lambda
    h.hubble_param = cfg.hubble_param

    # gas blocks: u from entropy [G2: fill_write_buffer IO_U converts
    # entropy -> u via A rho^(gamma-1)/(gamma-1)]
    n_gas_file = int(npart[0])
    u = rho = hsml = None
    if n_gas_file:
        gidx = idx[:n_gas_file]  # gas slots (all < ng)
        ent = np.asarray(state.gas.entropy)[gidx]
        dens = np.asarray(state.gas.density)[gidx]
        if opts.isotherm_eqs:
            u_val = ent / GAMMA_MINUS1
        else:
            # entropy -> u with PHYSICAL density [G2: io.c IO_U writes
            # Entropy/GAMMA_MINUS1 * pow(Density*a3inv, GAMMA_MINUS1)]
            a3inv = 1.0 / a_now**3 if cfg.comoving_integration_on else 1.0
            u_val = (ent * np.maximum(dens * a3inv, 1e-37) ** GAMMA_MINUS1
                     / GAMMA_MINUS1)
        u = u_val.astype(np.float32)
        rho = dens.astype(np.float32)
        hsml = np.asarray(state.gas.hsml)[gidx].astype(np.float32)

    pot = (np.asarray(state.p.pot)[idx].astype(np.float32)
           if with_potential else None)
    return SnapshotData(
        header=h,
        pos=pos.astype(np.float32), vel=vel.astype(np.float32),
        ids=ids, mass=mass.astype(np.float32),
        u=u, rho=rho, hsml=hsml, pot=pot,
    )


def ic_arrays_from_snapshot(snap: SnapshotData, cfg: SimConfig):
    """IC file -> (pos, vel, mass, ptype, u) arrays ready for init_state
    [G2: read_ic.c :: read_ic()] — velocity conversion applied there."""
    pos = np.asarray(snap.pos, np.float64)
    vel = np.asarray(snap.vel, np.float64)
    mass = np.asarray(snap.mass, np.float64)
    ptype = snap.ptype
    u = snap.u
    return pos, vel, mass, ptype, u
