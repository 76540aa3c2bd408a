#!/usr/bin/env python
"""Anatomy of a nearly-idle sync point on the real chip.

Warms lcdm_gas to late time ONCE (cached via io.restart in /tmp), then
times each step phase separately with the REAL activity mask, plus the
sparse gravity/SPH paths at several (k_act, k_pack) capacities — the
measurement that sets the sparse-dispatch thresholds in models/forces.

Usage: python -u tools/idle_anatomy.py [n_side] [a_warm]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=6, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2] * 1e3, out


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    a_warm = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35
    from gadget_leicester_tpu.core import timeline
    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.io.restart import load_restart, save_restart
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import (Simulation,
                                                        sync_point_step)

    box = 50000.0 * n_side / 64
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
    cache = f"/tmp/warm{n_side}_{a_warm:.2f}.npz"
    if os.path.exists(cache):
        import dataclasses
        from gadget_leicester_tpu.models.grids import make_grid_cache
        st, meta = load_restart(cache)
        sim.state = dataclasses.replace(
            st, grids=make_grid_cache(cfg, opts, st.p.n_max,
                                      st.gas.n_gas_max))
        print(f"loaded warm state from {cache}", flush=True)
    else:
        pos, vel, mass, ptype, u = lcdm_gas_ics(
            n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
            hubble=cfg.hubble_internal, g=cfg.grav_internal)
        sim.set_ics(pos, vel, mass, ptype, u=u)
        t0 = time.time()
        nstep = 0
        while sim.time < a_warm and nstep < 4000:
            sim.step(8)
            nstep += 8
        print(f"warmed to a={sim.time:.3f} in {nstep} steps "
              f"({time.time()-t0:.0f}s)", flush=True)
        save_restart(cache, sim.state)

    # advance to a <1%-active sync point
    n_tot = 2 * n_side**3
    st = sim.state
    for _ in range(8):
        ti_next = int(timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive))
        na = int(jnp.sum((st.p.ti_endstep == ti_next) & st.p.alive))
        if na < 0.01 * n_tot:
            break
        st = sync_point_step(st, sim.cfg, sim.opts)
    print(f"idle point: {na} active ({na/n_tot:.2%})", flush=True)

    # ---- step-phase anatomy ------------------------------------------
    from gadget_leicester_tpu.models import integrate
    from gadget_leicester_tpu.models.forces import compute_forces

    cfgh, optsh = sim.cfg, sim.opts
    ti_next_j = timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive)
    ti_next_j = jnp.minimum(ti_next_j, st.pm_ti_endstep)

    drift = jax.jit(lambda s, t: integrate.drift_all(s, cfgh, optsh, t))
    ms, std = timed(drift, st, ti_next_j)
    print(f"drift_all: {ms:7.1f} ms", flush=True)

    forces = jax.jit(lambda s: compute_forces(s, cfgh, optsh, do_pm=False))
    ms, stf = timed(forces, std)
    print(f"compute_forces (no PM): {ms:7.1f} ms", flush=True)

    adv = jax.jit(lambda s: integrate.advance_and_find_timesteps(
        s, cfgh, optsh))
    ms, _ = timed(adv, stf)
    print(f"advance_and_find_timesteps: {ms:7.1f} ms", flush=True)

    step = jax.jit(lambda s: sync_point_step(s, cfgh, optsh))
    ms, _ = timed(step, st)
    print(f"full sync_point_step: {ms:7.1f} ms", flush=True)

    # ---- activity census + entries tier sizing ------------------------
    std = stf       # forces output: grid caches are populated
    p = std.p
    active = (p.ti_endstep == std.ti_current) & p.alive
    from gadget_leicester_tpu.models.grids import sph_blocks_geometry
    from gadget_leicester_tpu.ops.pallas_cells import (
        ENTRY_LANES, build_active_entries, count_active_entries,
        grav_tile_flags)
    from gadget_leicester_tpu.ops.sph_blocks import count_block_entries

    grids = std.grids
    cl = grids.grav
    n_cells = cl.n_cells
    c3 = n_cells ** 3
    gflags = grav_tile_flags(cl, active, n_cells)
    g_entries = count_active_entries(cl, active, ENTRY_LANES)
    print(f"gravity grid {n_cells}^3={c3}: active tiles "
          f"{int(jnp.sum(gflags))} ({float(jnp.mean((gflags > 0) * 1.0)):.1%}),"
          f" entries {int(g_entries)} (k_max {max(256, (3 * c3) // 4)})",
          flush=True)

    cl_e, cl_o = grids.sph
    nb = cl_e.n_cells
    b3 = nb ** 3
    ng = std.gas.n_gas_max
    active_g = active[:ng] & (p.ptype[:ng] == 0) & p.alive[:ng]
    s_entries = count_block_entries(cl_e, active_g, ENTRY_LANES)
    print(f"sph blocks {nb}^3={b3}: entries {int(s_entries)} "
          f"(k_max {2 * b3})", flush=True)

    # ---- gravity dense vs entries --------------------------------------
    from gadget_leicester_tpu.models.forces import (SOFTFAC,
                                                    comoving_factors,
                                                    softening_table)
    from gadget_leicester_tpu.ops.pallas_cells import (
        shortrange_gravity_pallas_dma9, shortrange_gravity_pallas_entries)

    fac = comoving_factors(cfgh, std.ti_current)
    eps = softening_table(cfgh, fac.atime)
    soft = SOFTFAC * eps[p.ptype]
    asmth_len = 1.25 * box / optsh.pmgrid
    rcut = 4.5 * asmth_len
    cap = cl.cells.shape[1]

    dense = jax.jit(lambda fl: shortrange_gravity_pallas_dma9(
        p.pos, p.mass, soft, p.alive, box, n_cells=n_cells, capacity=cap,
        asmth=float(asmth_len), rcut=float(rcut), periodic=True,
        active=None, cl=cl, flags=fl))
    ms, _ = timed(dense, gflags)
    print(f"gravity dense (flag-gated): {ms:7.1f} ms", flush=True)
    ms, _ = timed(dense, jnp.ones_like(gflags))
    print(f"gravity dense (all-on):     {ms:7.1f} ms", flush=True)

    k_max = max(256, (3 * c3) // 4)
    ent = jax.jit(lambda act: shortrange_gravity_pallas_entries(
        p.pos, p.mass, soft, p.alive, box, n_cells=n_cells, capacity=cap,
        asmth=float(asmth_len), rcut=float(rcut),
        entry_cell=build_active_entries(cl, act, ENTRY_LANES, k_max)[0],
        entry_slot=build_active_entries(cl, act, ENTRY_LANES, k_max)[1],
        cl=cl, periodic=True))
    ms, _ = timed(ent, active)
    print(f"gravity entries (build+kernel+merge, k_max={k_max}): "
          f"{ms:7.1f} ms", flush=True)

    # ---- SPH dense vs entries ------------------------------------------
    from gadget_leicester_tpu.models.grids import KAPPA_SPH
    from gadget_leicester_tpu.ops.sph_blocks import (
        density_adaptive_blocks, density_adaptive_blocks_entries)

    gas = std.gas
    n_blocks, subcap = sph_blocks_geometry(cfgh, optsh, ng)
    subcell = box / (2 * n_blocks)
    max_hsml = (1.0 - 2.0 * KAPPA_SPH) * subcell
    pos_g = p.pos[:ng]
    mass_g = p.mass[:ng]
    gas_mask = p.alive[:ng] & (p.ptype[:ng] == 0)
    eps_gas = eps[0]
    min_hsml = cfgh.min_gas_hsml_fractional * SOFTFAC * eps_gas
    h_in = jnp.minimum(gas.hsml, max_hsml)
    act_full = active[:ng]

    ddense = jax.jit(lambda: density_adaptive_blocks(
        pos_g, gas.vel_pred, mass_g, h_in, gas_mask,
        des_num_ngb=cfgh.des_num_ngb, max_dev=cfgh.max_num_ngb_deviation,
        box=box, n_blocks=n_blocks, subcap=subcap, min_hsml=min_hsml,
        max_hsml=max_hsml, periodic=True, interpret=False,
        active=act_full, cls=(cl_e, cl_o))[0])
    ms, _ = timed(ddense)
    print(f"density dense (gated): {ms:7.1f} ms", flush=True)

    k_max_sph = 2 * b3
    dent = jax.jit(lambda act: density_adaptive_blocks_entries(
        pos_g, gas.vel_pred, mass_g, h_in, gas_mask,
        *build_active_entries(cl_e, act & gas_mask, ENTRY_LANES,
                              k_max_sph)[:2],
        des_num_ngb=cfgh.des_num_ngb, max_dev=cfgh.max_num_ngb_deviation,
        box=box, cls=(cl_e, cl_o), min_hsml=min_hsml,
        max_hsml=max_hsml, periodic=True, interpret=False))
    ms, _ = timed(dent, act_full)
    print(f"density entries (k_max={k_max_sph}): {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
