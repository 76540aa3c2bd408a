#!/usr/bin/env python
"""Per-component step profiler at bench scale (VERDICT r1 item 2a).

Times, on the real chip with scalar-readback fences (axon's
block_until_ready is a no-op): cell-list build, short-range gravity, PM,
SPH density (with sweep count), hydro, and the full sync_point_step.

Usage: python tools/profile_step.py [n_side]
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


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    fence(out)  # compile + warmup
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    fence(out)
    return (time.time() - t0) / reps, out


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from gadget_leicester_tpu.core.config import (SimOptions, auto_pmgrid,
                                                  parse_parameter_text)
    from gadget_leicester_tpu.models.ics import lcdm_gas_ics
    from gadget_leicester_tpu.models.simulation import Simulation, sync_point_step

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
                      sph_backend="cells")
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    t0 = time.time()
    sim.set_ics(pos, vel, mass, ptype, u=u)
    fence(sim.state.p.pos)
    print(f"init: {time.time()-t0:.1f}s  N={2*n_side**3}  pmgrid={pmgrid}")

    st = sim.state
    # advance one step so fields are steady-state
    t0 = time.time()
    st = sync_point_step(st, sim.cfg, sim.opts)
    fence(st.p.pos)
    print(f"step compile+run: {time.time()-t0:.1f}s")
    t, st2 = timeit(sync_point_step, st, sim.cfg, sim.opts, reps=3)
    print(f"FULL STEP: {t*1e3:.0f} ms")

    p = st.p
    from gadget_leicester_tpu.models.forces import (comoving_factors,
                                                    softening_table)
    from gadget_leicester_tpu.ops.neighbors import build_cell_list
    from gadget_leicester_tpu.ops.pm import ASMTH, RCUT, pm_forces_periodic
    fac = comoving_factors(cfg, st.ti_current)
    eps = softening_table(cfg, fac.atime)
    from gadget_leicester_tpu.ops.softening import SOFTFAC
    soft = SOFTFAC * eps[p.ptype]
    g = pmgrid
    asmth_len = ASMTH * box / g
    rcut = RCUT * asmth_len
    n_cells = max(3, int(box / rcut))
    occ = 2 * n_side**3 / n_cells**3
    print(f"SR grid: n_cells={n_cells}^3  mean occ={occ:.0f}")

    t, _ = timeit(build_cell_list, p.pos, p.alive, 0.0, box,
                  n_cells=n_cells, capacity=128, periodic=True)
    print(f"build_cell_list (grav): {t*1e3:.0f} ms")

    from gadget_leicester_tpu.ops.pallas_cells import shortrange_gravity_pallas_dma
    t, _ = timeit(shortrange_gravity_pallas_dma, p.pos, p.mass, soft, p.alive,
                  float(box), n_cells=n_cells, capacity=128,
                  asmth=float(asmth_len), rcut=float(rcut), periodic=True)
    print(f"SR gravity (pallas dma, incl. cell build): {t*1e3:.0f} ms")

    t, _ = timeit(pm_forces_periodic, p.pos, p.mass, p.alive, box, g,
                  with_potential=True)
    print(f"PM ({g}^3): {t*1e3:.0f} ms")

    # PM sub-phases (each as ONE jitted program)
    from gadget_leicester_tpu.ops.pm import (cic_deposit, cic_gather_vec,
                                             greens_function)
    posw = jnp.mod(p.pos, box)
    mw = jnp.where(p.alive, p.mass, 0.0)

    t, grid = timeit(jax.jit(lambda q, m: cic_deposit(q, m, box, g)),
                     posw, mw)
    print(f"  PM deposit only: {t*1e3:.0f} ms")

    @jax.jit
    def pm_ffts(grid):
        rho_k = jnp.fft.rfftn(grid)
        g_k = greens_function(g, box, ASMTH, dtype=grid.dtype)
        phi_k = g_k * rho_k / (box / g) ** 3
        h = box / g
        kf = 2.0 * jnp.pi / box
        kx = jnp.fft.fftfreq(g, 1.0 / g).astype(grid.dtype) * kf
        kz = jnp.arange(g // 2 + 1, dtype=grid.dtype) * kf
        KX, KY, KZ = jnp.meshgrid(kx, kx, kz, indexing="ij")
        comp = []
        for K in (KX, KY, KZ):
            mult = -1j * (8.0 * jnp.sin(K * h) - jnp.sin(2.0 * K * h)) / (6.0 * h)
            comp.append(jnp.fft.irfftn(mult * phi_k, (g, g, g)))
        comp.append(jnp.fft.irfftn(phi_k, (g, g, g)))
        return jnp.stack(comp, axis=-1)

    t, field = timeit(pm_ffts, grid)
    print(f"  PM FFTs (1 fwd + 4 inv + greens): {t*1e3:.0f} ms")
    t, _ = timeit(jax.jit(lambda f_, q: cic_gather_vec(f_, q, box, g)),
                  field, posw)
    print(f"  PM gather only: {t*1e3:.0f} ms")

    # SPH
    gas = st.gas
    ng = gas.n_gas_max
    gas_mask = p.alive[:ng] & (p.ptype[:ng] == 0)
    n_cells_s = max(3, int(round((ng / 100.0) ** (1.0 / 3.0))))
    max_hsml = box / n_cells_s
    from gadget_leicester_tpu.ops.pallas_cells import (density_adaptive_pallas,
                                                       hydro_force_pallas,
                                                       pack_sph_soa,
                                                       density_sums_pallas_dma)

    @jax.jit
    def dens(hsml, vel_pred):
        return density_adaptive_pallas(
            p.pos[:ng], vel_pred, p.mass[:ng],
            jnp.minimum(hsml, max_hsml), gas_mask,
            des_num_ngb=cfg.des_num_ngb, max_dev=cfg.max_num_ngb_deviation,
            box=float(box), n_cells=n_cells_s, capacity=128,
            min_hsml=0.0, max_hsml=max_hsml, periodic=True)

    t, (dres, cl_sph) = timeit(dens, gas.hsml, gas.vel_pred)
    print(f"SPH density adaptive (warm, n_cells={n_cells_s}^3): {t*1e3:.0f} ms, "
          f"sweeps={1+int(dres.iters)}")

    # one raw sweep cost
    soa = pack_sph_soa(cl_sph, p.pos[:ng], gas.vel_pred, p.mass[:ng],
                       jnp.ones(ng), gas_mask)
    idx = jnp.maximum(cl_sph.cells, 0)
    valid = (cl_sph.cells >= 0) & gas_mask[idx]
    h_slots = jnp.where(valid, dres.hsml[idx], 1.0)
    t, _ = timeit(jax.jit(lambda s_, h_: density_sums_pallas_dma(
        cl_sph, s_, h_, float(box), n_cells_s)), soa, h_slots)
    print(f"  one density sweep: {t*1e3:.0f} ms")

    pressure = gas.entropy_pred * dres.rho**(5.0 / 3.0)
    pressure = jnp.where(gas_mask, pressure, 0.0)

    @jax.jit
    def hyd(dres, pressure, vel_pred):
        return hydro_force_pallas(
            cl_sph, p.pos[:ng], vel_pred, p.mass[:ng], dres.hsml,
            dres.rho, pressure, dres.dhsml_factor, dres.div_vel,
            dres.curl_vel, gas_mask, visc_const=cfg.art_bulk_visc_const,
            box=float(box), n_cells=n_cells_s,
            hubble_a2_flow=fac.hubble_a2_flow,
            hubble_a2_norm=fac.hubble_a2_norm, fac_mu=fac.fac_mu)

    t, _ = timeit(hyd, dres, pressure, gas.vel_pred)
    print(f"SPH hydro: {t*1e3:.0f} ms")

    # cell-list for SPH separately (it is inside density time too)
    t, _ = timeit(build_cell_list, p.pos[:ng], gas_mask, 0.0, box,
                  n_cells=n_cells_s, capacity=128, periodic=True)
    print(f"build_cell_list (sph): {t*1e3:.0f} ms")

    t, _ = timeit(jax.jit(lambda: pack_sph_soa(
        cl_sph, p.pos[:ng], gas.vel_pred, p.mass[:ng],
        jnp.ones(ng), gas_mask)))
    print(f"pack_sph_soa: {t*1e3:.0f} ms")


if __name__ == "__main__":
    main()
