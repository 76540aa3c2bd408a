#!/usr/bin/env python
"""Benchmark: particle-updates/sec/chip on the lcdm_gas-style TreePM+SPH
workload (BASELINE.md north-star metric; reference instrument:
[G2: timings.txt part/sec, gravtree.c]).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Runs on whatever jax.devices() provides (the driver runs it on one real
TPU chip). Measures steady-state sync-point throughput: total particle
updates (active particles per sync point, summed) / wall-clock, after one
warmup step that pays compile.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    n_side = int(os.environ.get("BENCH_NSIDE", "64"))
    n_steps = int(os.environ.get("BENCH_STEPS", "8"))
    import jax
    import jax.numpy as jnp

    from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import Simulation
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
    opts = SimOptions(periodic=True, pmgrid=n_side * 2, gravity_mode="treepm",
                      sph_backend="cells")
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    t0 = time.time()
    sim.set_ics(pos, vel, mass, ptype, u=u)
    jax.block_until_ready(sim.state.p.pos)
    init_s = time.time() - t0

    # warmup (pays jit compile for the step)
    t0 = time.time()
    sim.step()
    jax.block_until_ready(sim.state.p.pos)
    compile_s = time.time() - t0

    # measure: each sync point updates the active set; count active updates
    updates = 0
    t0 = time.time()
    for _ in range(n_steps):
        ti_prev = sim.state.p.ti_endstep
        alive = sim.state.p.alive
        active = timeline.active_mask(
            ti_prev, timeline.min_active_ti_end(ti_prev, alive), alive)
        updates += int(jnp.sum(active))
        sim.step()
    jax.block_until_ready(sim.state.p.pos)
    elapsed = time.time() - t0

    ups = updates / elapsed
    baseline = 1e7  # north-star target [BASELINE.md]
    print(json.dumps({
        "metric": "particle_updates_per_sec_per_chip_lcdm_gas",
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / baseline, 4),
        "detail": {
            "n_particles": int(2 * n_side**3),
            "n_side": n_side,
            "steps": n_steps,
            "elapsed_s": round(elapsed, 3),
            "compile_s": round(compile_s, 2),
            "init_s": round(init_s, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
