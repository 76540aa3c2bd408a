#!/usr/bin/env python
"""Time the SPMD slab step vs the single-chip step at bench scale
(VERDICT r3 item 5 done-criterion: a real-chip mesh=1 run through
parallel/spmd.py within 1.5x of the single-chip step).

Usage: python -u tools/bench_spmd.py [n_side] [n_devices] [use_pallas]

With n_devices=1 on the real chip this measures the SPMD driver's
overhead (ghost exchange, catenated-domain kernels) against the
single-chip sync_point_step on identical ICs. [G2: the reference's MPI
ranks run the same force loops as serial — an np=1 MPI run costs ~the
serial run.]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    use_pallas = sys.argv[3] if len(sys.argv) > 3 else "auto"
    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import (Simulation,
                                                        sync_point_step)

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
                      sph_backend="cells", use_pallas=use_pallas)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)

    # -- single-chip reference -------------------------------------------
    sim = Simulation(cfg, opts)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    st = sim.state
    st = sync_point_step(st, sim.cfg, sim.opts)
    _ = float(st.p.pos[0, 0])
    ts = []
    for _rep in range(3):
        t0 = time.time()
        st = sync_point_step(st, sim.cfg, sim.opts)
        _ = float(st.p.pos[0, 0])
        ts.append(time.time() - t0)
    t_single = min(ts)
    print(f"single-chip step: {t_single*1e3:.0f} ms "
          f"(ovf={int(st.overflow_flags)})", flush=True)

    # -- SPMD driver ------------------------------------------------------
    sim2 = Simulation(cfg, opts, mesh=n_dev)
    sim2.set_ics(pos, vel, mass, ptype, u=u)
    st2 = sim2.state
    step = sim2._spmd_step
    st2 = step(st2)
    _ = float(jnp.asarray(st2.p.pos).reshape(-1)[0])
    ts = []
    for _rep in range(3):
        t0 = time.time()
        st2 = step(st2)
        _ = float(jnp.asarray(st2.p.pos).reshape(-1)[0])
        ts.append(time.time() - t0)
    t_spmd = min(ts)
    print(f"spmd mesh={n_dev} step: {t_spmd*1e3:.0f} ms "
          f"(ovf={int(st2.overflow_flags)})", flush=True)
    print(f"ratio spmd/single = {t_spmd/t_single:.2f}  "
          f"(pallas={use_pallas})", flush=True)


if __name__ == "__main__":
    main()
