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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
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

    # ---- SPH sub-phases, exactly as the real step calls them ----------
    from gadget_leicester_tpu.models.forces import (comoving_factors,
                                                    compute_sph)
    fac = comoving_factors(cfg, st_d.ti_current)
    act_g = active[:ng]

    jsph = jax.jit(lambda s: compute_sph(s, sim.cfg, sim.opts, fac,
                                         act_g))
    chained("compute_sph TOTAL", lambda salt: jsph(
        dataclasses.replace(st_d, p=dataclasses.replace(
            st_d.p, pos=st_d.p.pos + salt * 1e-6))))

    from gadget_leicester_tpu.models.grids import (KAPPA_SPH,
                                                   sph_blocks_geometry)
    from gadget_leicester_tpu.ops.sph_blocks import (
        density_adaptive_blocks, hydro_force_blocks)
    n_blocks, subcap = sph_blocks_geometry(cfg, sim.opts, ng)
    cls_in = st_d.grids.sph
    subcell = cfg.box_size / (2 * n_blocks)
    max_hsml = (1.0 - 2.0 * KAPPA_SPH) * subcell
    gas = st_d.gas
    gas_mask = st_d.p.alive[:ng] & (st_d.p.ptype[:ng] == 0)
    from gadget_leicester_tpu.ops.softening import SOFTFAC
    from gadget_leicester_tpu.models.forces import softening_table
    eps_gas = softening_table(cfg, fac.atime)[0]
    min_hsml = cfg.min_gas_hsml_fractional * SOFTFAC * eps_gas
    dkw = dict(des_num_ngb=cfg.des_num_ngb,
               max_dev=cfg.max_num_ngb_deviation,
               box=float(cfg.box_size), min_hsml=min_hsml,
               max_hsml=max_hsml, periodic=True)

    jd = jax.jit(lambda q: density_adaptive_blocks(
        q, gas.vel_pred, st_d.p.mass[:ng],
        jnp.minimum(gas.hsml, max_hsml), gas_mask,
        n_blocks=n_blocks, subcap=subcap, active=act_g, cls=cls_in,
        **dkw)[0])
    chained("  density_adaptive_blocks (real call)",
            lambda salt: jd(st_d.p.pos[:ng] + salt * 1e-6))

    dres = jd(st_d.p.pos[:ng])
    from gadget_leicester_tpu.core.config import GAMMA
    pressure = jnp.where(gas_mask, gas.entropy_pred * dres.rho**GAMMA, 0.0)
    hkw = dict(visc_const=cfg.art_bulk_visc_const,
               box=float(cfg.box_size),
               hubble_a2_flow=fac.hubble_a2_flow,
               hubble_a2_norm=fac.hubble_a2_norm, fac_mu=fac.fac_mu)
    jh = jax.jit(lambda q: hydro_force_blocks(
        cls_in, q, gas.vel_pred, st_d.p.mass[:ng], dres.hsml, dres.rho,
        pressure, dres.dhsml_factor, dres.div_vel, dres.curl_vel,
        gas_mask, active=act_g, **hkw))
    chained("  hydro_force_blocks (real call)",
            lambda salt: jh(st_d.p.pos[:ng] + salt * 1e-6))

    # density with h exactly as drift left it (no extra Newton salt)
    from gadget_leicester_tpu.ops.sph_blocks import density_sums_blocks
    from gadget_leicester_tpu.ops.pallas_cells import pack_sph_soa
    cl_e2, cl_o2 = cls_in
    ones = jnp.ones(ng, jnp.float32)
    jsweep = jax.jit(lambda q: density_sums_blocks(
        cl_e2,
        pack_sph_soa(cl_e2, q, gas.vel_pred, st_d.p.mass[:ng], ones,
                     gas_mask),
        pack_sph_soa(cl_o2, q, gas.vel_pred, st_d.p.mass[:ng], ones,
                     gas_mask),
        jnp.minimum(gas.hsml, max_hsml)[
            jnp.maximum(cl_e2.cells, 0)].reshape(cl_e2.cells.shape),
        float(cfg.box_size)))
    chained("  one density sweep (pack+kernel)",
            lambda salt: jsweep(st_d.p.pos[:ng] + salt * 1e-6))

    jpk = jax.jit(lambda q: (
        pack_sph_soa(cl_e2, q, gas.vel_pred, st_d.p.mass[:ng], ones,
                     gas_mask),
        pack_sph_soa(cl_o2, q, gas.vel_pred, st_d.p.mass[:ng], ones,
                     gas_mask)))
    chained("  2x pack_sph_soa", lambda salt: jpk(
        st_d.p.pos[:ng] + salt * 1e-6))


if __name__ == "__main__":
    main()
