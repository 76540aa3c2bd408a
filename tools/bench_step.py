#!/usr/bin/env python
"""Time sync_point_step for a given SPH backend at bench scale.
Usage: python -u tools/bench_step.py [n_side] [backend]
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
    backend = sys.argv[2] if len(sys.argv) > 2 else "blocks"
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
                      sph_backend=backend)
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    t0 = time.time()
    sim.set_ics(pos, vel, mass, ptype, u=u)
    _ = float(sim.state.p.pos[0, 0])
    print(f"init: {time.time()-t0:.1f}s backend={backend}", flush=True)
    st = sim.state
    t0 = time.time()
    st = sync_point_step(st, sim.cfg, sim.opts)
    _ = float(st.p.pos[0, 0])
    print(f"step compile+run: {time.time()-t0:.1f}s", flush=True)
    for rep in range(3):
        t0 = time.time()
        st = sync_point_step(st, sim.cfg, sim.opts)
        _ = float(st.p.pos[0, 0])
        print(f"step: {(time.time()-t0)*1e3:.0f} ms  overflow="
              f"{int(st.overflow_flags)}", flush=True)


if __name__ == "__main__":
    main()
