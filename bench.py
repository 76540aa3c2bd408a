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
    # default = the canonical BASELINE config: lcdm_gas at 128^3
    # (2 x 128^3 = 4.2M particles, TreePM + SPH)
    n_side = int(os.environ.get("BENCH_NSIDE", "128"))
    n_steps = int(os.environ.get("BENCH_STEPS", "6"))
    import jax

    # persistent compilation cache: the step program costs ~10-20 min of
    # (remote) compile on this box; cached executables bring repeat runs
    # down to seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import (Simulation,
                                                        run_steps_counted)

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
    # pmgrid ~ 1.55*n_side puts the short-range cell occupancy near 100
    # for two species with cap-128 tiles (ncells = floor(pmgrid/5.625),
    # occ = 2 n_side^3/ncells^3); the floor matters — verify occ <= ~110
    pmgrid = int(os.environ.get("BENCH_PMGRID", "0"))
    if pmgrid == 0:
        from gadget_leicester_tpu.core.config import auto_pmgrid
        pmgrid = auto_pmgrid(2 * n_side**3)
    opts = SimOptions(periodic=True, pmgrid=pmgrid, gravity_mode="treepm",
                      sph_backend="auto")  # auto -> block-packed on TPU
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    t0 = time.time()
    sim.set_ics(pos, vel, mass, ptype, u=u)
    jax.block_until_ready(sim.state.p.pos)
    init_s = time.time() - t0

    # Two compiled programs total: the step itself and a tiny active-set
    # counter. (Anything uncompiled costs a remote-compile round trip per
    # distinct op on the axon tunnel; a fused multi-step scan would be one
    # program but its compile time scales badly — two small programs win.)
    from gadget_leicester_tpu.core import timeline
    from gadget_leicester_tpu.models.simulation import sync_point_step

    @jax.jit
    def count_active(st):
        ti_next = timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive)
        return jnp.sum(timeline.active_mask(st.p.ti_endstep, ti_next,
                                            st.p.alive))

    t0 = time.time()
    st = sync_point_step(sim.state, sim.cfg, sim.opts)
    upd0 = count_active(st)
    upd0 = upd0 + upd0  # compile the accumulate-add too
    # NB: jax.block_until_ready does NOT synchronise on the axon platform;
    # a scalar readback is the only reliable fence.
    _ = float(st.p.pos[0, 0]) + int(upd0)
    compile_s = time.time() - t0

    # No device->host transfer inside the loop (a scalar readback over the
    # axon tunnel costs seconds); accumulate the count on device, read once.
    total = None
    t0 = time.time()
    for _ in range(n_steps):
        c = count_active(st)
        total = c if total is None else total + c
        st = sync_point_step(st, sim.cfg, sim.opts)
    _ = float(st.p.pos[0, 0])  # readback fence (see above)
    elapsed = time.time() - t0
    updates = int(total)

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
            "overflow_flags": int(st.overflow_flags),
            "pmgrid": pmgrid,
        },
    }))


if __name__ == "__main__":
    main()
