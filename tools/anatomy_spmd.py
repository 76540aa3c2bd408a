#!/usr/bin/env python
"""Cumulative phase bisection of the SPMD slab step (mesh=1, real chip):
where does the per-chip overhead vs the single-chip step live?
Memoization-safe (salted chained inputs, see profile_step2.py).

Usage: python -u tools/anatomy_spmd.py [n_side] [n_devices]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def chained(label, fn, reps=3):
    out = fn(jnp.float32(0.0))
    s = fence(out)
    dts = []
    for i in range(reps):
        salt = jnp.float32(abs(s) * 1e-30 + (i + 1))
        t0 = time.time()
        out = fn(salt)
        s = fence(out)
        dts.append((time.time() - t0) * 1e3)
    print(f"{label}: {min(dts):.1f} ms "
          f"(reps {', '.join(f'{d:.0f}' for d in dts)})", flush=True)
    return min(dts)


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import (Simulation,
                                                        sync_point_step)
    from gadget_leicester_tpu.parallel.spmd import make_spmd_step

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
                      sph_backend="cells", use_pallas="auto")
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)

    # single-chip reference (the flagship blocks backend AND the cells
    # backend bench_spmd historically compared against)
    for backend in ("auto", "cells"):
        o1 = dataclasses.replace(opts, sph_backend=backend)
        sim = Simulation(cfg, o1)
        sim.set_ics(pos, vel, mass, ptype, u=u)
        st0 = sync_point_step(sim.state, sim.cfg, o1)
        fence(st0.p.pos)
        chained(f"single-chip step (sph={backend})", lambda salt: (
            sync_point_step(dataclasses.replace(
                st0, p=dataclasses.replace(st0.p,
                                           pos=st0.p.pos + salt * 1e-6)),
                sim.cfg, o1)).p.pos)

    # SPMD driver, cumulative phases
    sim2 = Simulation(cfg, opts, mesh=n_dev)
    sim2.set_ics(pos, vel, mass, ptype, u=u)
    st2 = sim2.state
    full = sim2._spmd_step
    st2 = full(st2)
    fence(st2.p.pos)

    cum = []
    for ph in ("drift", "migrate", "gravity", "sph", "kick"):
        cum.append(ph)
        step = make_spmd_step(cfg, opts, sim2.mesh,
                              edges=sim2.spmd_edges,
                              domain=sim2.spmd_domain,
                              phases=frozenset(cum))(st2)
        chained(f"  upto {ph}", lambda salt, stp=step: stp(
            dataclasses.replace(st2, p=dataclasses.replace(
                st2.p, pos=st2.p.pos + salt * 1e-6))).p.pos)

    chained("SPMD FULL step", lambda salt: full(
        dataclasses.replace(st2, p=dataclasses.replace(
            st2.p, pos=st2.p.pos + salt * 1e-6))).p.pos)


if __name__ == "__main__":
    main()
