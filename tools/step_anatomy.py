#!/usr/bin/env python
"""Bisect the full sync_point_step cost at bench scale into its phase
costs (drift / forces / advance / activity bookkeeping), memoization-safe
(salted chained inputs, see profile_step2.py).

Usage: python -u tools/step_anatomy.py [n_side]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


FENCE_MS = [0.0]


def chained(label, fn, reps=3):
    out = fn(jnp.float32(0.0))
    s = fence(out)
    dts = []
    for i in range(reps):
        salt = jnp.float32(abs(s) * 1e-30 + (i + 1))
        t0 = time.time()
        out = fn(salt)
        s = fence(out)
        dts.append((time.time() - t0) * 1e3 - FENCE_MS[0])
    print(f"{label}: {min(dts):.1f} ms "
          f"(reps {', '.join(f'{d:.0f}' for d in dts)})", flush=True)
    return min(dts)


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.models import integrate
    from gadget_leicester_tpu.models.forces import compute_forces
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import (Simulation,
                                                        sync_point_step)
    from gadget_leicester_tpu.core import timeline

    box = 50000.0
    param = f"""
InitCondFile x
OutputDir  /tmp/bench_out
TimeBegin  0.090909
TimeMax    1.0
ComovingIntegrationOn 1
PeriodicBoundariesOn 1
BoxSize    {box}
Omega0     0.3
OmegaLambda 0.7
OmegaBaryon 0.04
HubbleParam 0.7
ErrTolIntAccuracy 0.025
MaxSizeTimestep 0.025
CourantFac 0.15
DesNumNgb 33
MaxNumNgbDeviation 2
ArtBulkViscConst 0.8
InitGasTemp 1000
MinGasTemp 5
SofteningGas  {box / n_side / 30:.3f}
SofteningHalo {box / n_side / 30:.3f}
SofteningGasMaxPhys  {box / n_side / 30:.3f}
SofteningHaloMaxPhys {box / n_side / 30:.3f}
MinGasHsmlFractional 0.1
"""
    cfg = parse_parameter_text(param)
    pmgrid = auto_pmgrid(2 * n_side**3)
    opts = SimOptions(periodic=True, pmgrid=pmgrid, gravity_mode="treepm",
                      sph_backend="auto")
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    fence(sim.state.p.pos)
    # fence latency
    lats = []
    x = jnp.zeros((8,), jnp.float32)
    for _ in range(7):
        t0 = time.time()
        fence(x)
        lats.append(time.time() - t0)
    FENCE_MS[0] = sorted(lats)[3] * 1e3
    print(f"fence: {FENCE_MS[0]:.1f} ms", flush=True)

    st = sim.state
    st = sync_point_step(st, sim.cfg, sim.opts)   # warm state + compile
    fence(st.p.pos)

    jstep = jax.jit(lambda s: sync_point_step(s, sim.cfg, sim.opts))

    def step_fn(salt):
        nonlocal st
        p2 = st.p.pos + salt * 1e-6
        import dataclasses
        st2 = dataclasses.replace(st, p=dataclasses.replace(st.p, pos=p2))
        return jstep(st2)

    chained("FULL STEP", step_fn)
    st = jstep(st)
    fence(st.p.pos)

    import dataclasses

    ti_next = timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive)
    ti_next = jnp.minimum(ti_next, st.pm_ti_endstep)

    jdrift = jax.jit(lambda s: integrate.drift_all(s, sim.cfg, sim.opts,
                                                   ti_next))
    chained("drift_all", lambda salt: jdrift(dataclasses.replace(
        st, p=dataclasses.replace(st.p, pos=st.p.pos + salt * 1e-6))))

    st_d = jdrift(st)
    fence(st_d.p.pos)

    jforce = jax.jit(lambda s: compute_forces(s, sim.cfg, sim.opts,
                                              do_pm=s.ti_current
                                              == s.pm_ti_endstep))
    chained("compute_forces (pm+sr+sph)", lambda salt: jforce(
        dataclasses.replace(st_d, p=dataclasses.replace(
            st_d.p, pos=st_d.p.pos + salt * 1e-6))))

    jforce_ns = jax.jit(lambda s: compute_forces(
        s, sim.cfg, sim.opts, do_sph=False,
        do_pm=s.ti_current == s.pm_ti_endstep))
    chained("compute_forces (no sph)", lambda salt: jforce_ns(
        dataclasses.replace(st_d, p=dataclasses.replace(
            st_d.p, pos=st_d.p.pos + salt * 1e-6))))

    st_f = jforce(st_d)
    fence(st_f.p.pos)

    jadv = jax.jit(lambda s: integrate.advance_and_find_timesteps(
        s, sim.cfg, sim.opts))
    chained("advance_and_find_timesteps", lambda salt: jadv(
        dataclasses.replace(st_f, p=dataclasses.replace(
            st_f.p, vel=st_f.p.vel + salt * 1e-9))))

    # activity bookkeeping that runs every step inside compute_forces
    from gadget_leicester_tpu.models.grids import grav_grid_geometry
    from gadget_leicester_tpu.ops.pallas_cells import (
        ENTRY_LANES, count_active_entries)
    from gadget_leicester_tpu.ops.sph_blocks import count_block_entries
    n_cells, cap_hint, margin = grav_grid_geometry(cfg, opts, st.p.n_max)
    cl = st.grids.grav
    active = (st_d.p.ti_endstep == st_d.ti_current) & st_d.p.alive

    jcnt = jax.jit(lambda a: count_active_entries(cl, a, ENTRY_LANES))
    chained("count_active_entries", lambda salt: jcnt(
        active & (st_d.p.mass + salt >= 0)))
    cl_e = st.grids.sph[0]
    ng = st.gas.n_gas_max
    jcntb = jax.jit(lambda a: count_block_entries(cl_e, a, ENTRY_LANES))
    chained("count_block_entries", lambda salt: jcntb(
        active[:ng] & (st_d.p.mass[:ng] + salt >= 0)))


if __name__ == "__main__":
    main()
