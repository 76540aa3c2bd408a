#!/usr/bin/env python
"""Cumulative bisection of compute_sph at bench scale: where do the
~400 ms between (density + hydro + counts) and the compute_sph total go?
Memoization-safe (salted chained inputs, see profile_step2.py).

Usage: python -u tools/anatomy_sph.py [n_side]
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
    lats = []
    x = jnp.zeros((8,), jnp.float32)
    for _ in range(7):
        t0 = time.time()
        fence(x)
        lats.append(time.time() - t0)
    FENCE_MS[0] = sorted(lats)[3] * 1e3
    print(f"fence: {FENCE_MS[0]:.1f} ms", flush=True)

    st = sim.state
    st = sync_point_step(st, sim.cfg, sim.opts)
    fence(st.p.pos)

    jstep = jax.jit(lambda s: sync_point_step(s, sim.cfg, sim.opts))

    def perturbed(salt):
        p2 = st_d.p.pos + salt * 1e-6
        return dataclasses.replace(st_d, p=dataclasses.replace(
            st_d.p, pos=p2))

    def step_fn(salt):
        p2 = st.p.pos + salt * 1e-6
        st2 = dataclasses.replace(st, p=dataclasses.replace(st.p, pos=p2))
        return jstep(st2)

    chained("FULL STEP", step_fn)
    st = jstep(st)
    fence(st.p.pos)

    ti_next = timeline.min_active_ti_end(st.p.ti_endstep, st.p.alive)
    ti_next = jnp.minimum(ti_next, st.pm_ti_endstep)
    jdrift = jax.jit(lambda s: integrate.drift_all(s, sim.cfg, sim.opts,
                                                   ti_next))
    st_d = jdrift(st)
    fence(st_d.p.pos)

    from gadget_leicester_tpu.models.forces import (comoving_factors,
                                                    compute_forces,
                                                    compute_sph)
    fac = comoving_factors(cfg, st_d.ti_current)
    ng = st_d.gas.n_gas_max
    active = (st_d.p.ti_endstep == st_d.ti_current) & st_d.p.alive
    act_g = active[:ng]

    jforce_ns = jax.jit(lambda s: compute_forces(
        s, sim.cfg, sim.opts, do_sph=False,
        do_pm=s.ti_current == s.pm_ti_endstep))
    chained("compute_forces (no sph)", lambda s: jforce_ns(perturbed(s)))

    jsph = jax.jit(lambda s: compute_sph(s, sim.cfg, sim.opts, fac, act_g))
    chained("compute_sph TOTAL", lambda s: jsph(perturbed(s)))

    # ---- cumulative stages of compute_sph (blocks backend) -------------
    from gadget_leicester_tpu.models.grids import (KAPPA_SPH, refresh,
                                                   sph_blocks_geometry)
    from gadget_leicester_tpu.models.forces import (gather_gas,
                                                    softening_table)
    from gadget_leicester_tpu.ops.softening import SOFTFAC
    from gadget_leicester_tpu.ops.sph_blocks import (
        build_block_lists, count_block_entries, density_adaptive_blocks,
        hydro_force_blocks)
    from gadget_leicester_tpu.ops.pallas_cells import ENTRY_LANES

    n_blocks, subcap = sph_blocks_geometry(cfg, sim.opts, ng)
    eps_gas = softening_table(cfg, fac.atime)[0]
    min_hsml = cfg.min_gas_hsml_fractional * SOFTFAC * eps_gas
    dkw = dict(des_num_ngb=cfg.des_num_ngb,
               max_dev=cfg.max_num_ngb_deviation,
               box=float(cfg.box_size), min_hsml=min_hsml,
               periodic=True)

    def upto(stage):
        def fn(state):
            gas = state.gas
            pos_g, mass_g, gas_mask = gather_gas(state)
            active_g2 = act_g & gas_mask

            def build_blocks():
                return build_block_lists(pos_g, gas_mask, 0.0,
                                         cfg.box_size,
                                         n_blocks=n_blocks, subcap=subcap,
                                         periodic=True)

            grids = state.grids
            count_now = jnp.sum(gas_mask).astype(jnp.int32)
            subcell_c = 1.0 / grids.sph[0].inv_cell[0]
            margin = 2.0 * KAPPA_SPH * subcell_c
            cls_in, sv, sd, sc, _ = refresh(
                grids.sph, grids.sph_valid, grids.sph_disp,
                grids.sph_count, margin, count_now, build_blocks)
            if stage == "refresh":
                return cls_in[0].cells
            subcell = cfg.box_size / (2 * n_blocks)
            max_hsml = (1.0 - 2.0 * KAPPA_SPH) * subcell
            hsml_in = jnp.minimum(gas.hsml, max_hsml)
            b3 = n_blocks**3
            k_max_sph = 2 * b3
            n_act_g = jnp.sum(active_g2.astype(jnp.int32))
            total_e = jax.lax.cond(
                n_act_g <= k_max_sph * ENTRY_LANES,
                lambda _: count_block_entries(cls_in[0], active_g2,
                                              ENTRY_LANES),
                lambda _: jnp.int32(k_max_sph + 1), operand=None)
            if stage == "counts":
                return total_e
            dres, _cls = density_adaptive_blocks(
                pos_g, gas.vel_pred, mass_g, hsml_in, gas_mask,
                n_blocks=n_blocks, subcap=subcap, active=act_g,
                cls=cls_in, max_hsml=max_hsml, **dkw)
            if stage == "density":
                return dres.rho
            take = act_g & gas_mask & (dres.rho > 0)
            from gadget_leicester_tpu.core.config import GAMMA
            rho_m = jnp.where(take, dres.rho, gas.density)
            hsml_m = jnp.where(take, dres.hsml, gas.hsml)
            pressure = jnp.where(gas_mask,
                                 gas.entropy_pred * rho_m**GAMMA, 0.0)
            dh_m = jnp.where(take, dres.dhsml_factor,
                             gas.dhsml_density_factor)
            dv_m = jnp.where(take, dres.div_vel, gas.div_vel)
            cv_m = jnp.where(take, dres.curl_vel, gas.curl_vel)
            hres = hydro_force_blocks(
                cls_in, pos_g, gas.vel_pred, mass_g, hsml_m, rho_m,
                pressure, dh_m, dv_m, cv_m, gas_mask, active=act_g,
                visc_const=cfg.art_bulk_visc_const,
                box=float(cfg.box_size),
                hubble_a2_flow=fac.hubble_a2_flow,
                hubble_a2_norm=fac.hubble_a2_norm, fac_mu=fac.fac_mu)
            return hres.acc
        return fn

    for stage in ("refresh", "counts", "density", "hydro"):
        jfn = jax.jit(upto(stage))
        chained(f"  upto {stage}", lambda s, f=jfn: f(perturbed(s)))


if __name__ == "__main__":
    main()
