#!/usr/bin/env python
"""Measure step cost vs active fraction (VERDICT r1 item 3: with per-tile
activity gating, a sync point's cost must scale with the active set, not
N). Evolves lcdm_gas until the timestep bins split, then times every
sync point, recording (n_active, wall ms).

Usage: python -u tools/bench_active.py [n_side] [a_warm] [n_timed]
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
    a_warm = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35
    n_timed = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    from gadget_leicester_tpu.core import timeline
    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import (Simulation,
                                                        sync_point_step)

    box = 50000.0
    param = f"""
InitCondFile x
OutputDir  /tmp/act_out
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
                      sph_backend="auto", sph_capacity=64, sr_capacity=256)
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    n_tot = 2 * n_side**3

    @jax.jit
    def count_active(st):
        ti_next = timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive)
        return jnp.sum(timeline.active_mask(st.p.ti_endstep, ti_next,
                                            st.p.alive))

    t0 = time.time()
    st = sim.state
    nstep = 0
    while sim.time < a_warm and nstep < 4000:
        sim.step(8)
        nstep += 8
    print(f"warmed to a={sim.time:.3f} in {nstep} steps "
          f"({time.time()-t0:.0f}s) ovf={int(sim.state.overflow_flags)}",
          flush=True)

    st = sim.state
    # warm the step program at the current bin structure, then measure the
    # axon scalar-readback latency (it would otherwise pollute per-step
    # times: a pure fence costs ~30-150 ms over the tunnel)
    st = sync_point_step(st, sim.cfg, sim.opts)
    _ = float(st.p.pos[0, 0])
    lats = []
    for _ in range(7):
        t0 = time.time()
        _ = float(st.p.pos[0, 0])
        lats.append(time.time() - t0)
    fence_ms = sorted(lats)[len(lats) // 2] * 1e3
    print(f"fence latency: {fence_ms:.1f} ms (median of 7)", flush=True)

    # (a) per-step fenced timings, fence-corrected
    rows = []
    for i in range(n_timed):
        na = int(count_active(st))
        t0 = time.time()
        st = sync_point_step(st, sim.cfg, sim.opts)
        _ = float(st.p.pos[0, 0])
        dt = (time.time() - t0) * 1e3 - fence_ms
        rows.append((na, dt))
        print(f"step {i}: active={na} ({na/n_tot:5.1%})  {dt:7.1f} ms",
              flush=True)

    # (b) batched cross-check: dispatch a whole segment, fence ONCE;
    # counts are read back after the clock stops (device scalars)
    counts = []
    t0 = time.time()
    for _ in range(n_timed):
        counts.append(count_active(st))
        st = sync_point_step(st, sim.cfg, sim.opts)
    _ = float(st.p.pos[0, 0])
    seg_s = time.time() - t0
    nas = [int(c) for c in counts]
    upd = sum(nas)
    print(f"batched segment: {n_timed} steps, {seg_s*1e3:.0f} ms total, "
          f"{upd} updates -> EFFECTIVE {upd/seg_s:,.0f} updates/s "
          f"(mean step {seg_s/n_timed*1e3:.0f} ms)", flush=True)

    full = [d for a, d in rows if a > 0.9 * n_tot]
    part = [d for a, d in rows if a < 0.02 * n_tot]
    if full and part:
        f_ms, p_ms = sum(full) / len(full), sum(part) / len(part)
        print(f"mean full-active step {f_ms:.0f} ms; "
              f"mean <2%-active step {p_ms:.0f} ms "
              f"(ratio {p_ms/f_ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
