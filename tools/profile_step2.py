#!/usr/bin/env python
"""Memoization-safe per-component step profiler at bench scale.

The axon runtime MEMOIZES identical executions (same executable + same
inputs), so the fixed-input timeit pattern of tools/profile_step.py
reports ~free reps after the first — its round-2/3 component numbers are
lower bounds at best. Every timing here CHAINS a data-dependent salt
through the repetitions: rep i's input embeds a scalar read back from
rep i-1's output, so no two executions are identical AND each rep is
fenced by the readback (axon block_until_ready is a no-op; the readback
is the fence). The median fence latency is measured and subtracted.

Usage: python -u tools/profile_step2.py [n_side]
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


def measure_fence():
    lats = []
    x = jnp.zeros((8,), jnp.float32)
    for _ in range(7):
        t0 = time.time()
        fence(x)
        lats.append(time.time() - t0)
    FENCE_MS[0] = sorted(lats)[3] * 1e3
    print(f"fence latency: {FENCE_MS[0]:.1f} ms (median of 7)", flush=True)


def chained(label, fn, reps=3):
    """fn(salt: f32 scalar jax array) -> any pytree. Salt MUST be folded
    into the inputs at a bit-changing magnitude by the caller."""
    out = fn(jnp.float32(0.0))
    s = fence(out)                       # compile + warmup
    dts = []
    for i in range(reps):
        salt = jnp.float32(abs(s) * 1e-30 + (i + 1))
        t0 = time.time()
        out = fn(salt)
        s = fence(out)
        dts.append((time.time() - t0) * 1e3 - FENCE_MS[0])
    print(f"{label}: {min(dts):.1f} ms  (reps {', '.join(f'{d:.0f}' for d in dts)})",
          flush=True)
    return min(dts)


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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
                      sph_backend="auto")      # the official bench options
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = lcdm_gas_ics(
        n_side=n_side, box=box, omega0=0.3, omega_b=0.04,
        hubble=cfg.hubble_internal, g=cfg.grav_internal)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    fence(sim.state.p.pos)
    n_tot = 2 * n_side**3
    print(f"N={n_tot}  pmgrid={pmgrid}", flush=True)
    measure_fence()

    # warm + steady state
    st = sim.state
    t0 = time.time()
    st = sync_point_step(st, sim.cfg, sim.opts)
    fence(st.p.pos)
    print(f"step compile+run: {time.time()-t0:.1f}s", flush=True)

    # FULL STEP, chained on evolving state (naturally perturbed)
    dts = []
    for i in range(4):
        t0 = time.time()
        st = sync_point_step(st, sim.cfg, sim.opts)
        fence(st.p.pos)
        dts.append((time.time() - t0) * 1e3 - FENCE_MS[0])
    print(f"FULL STEP: {min(dts):.1f} ms  "
          f"(reps {', '.join(f'{d:.0f}' for d in dts)})", flush=True)

    p = st.p
    from gadget_leicester_tpu.models.forces import (comoving_factors,
                                                    softening_table)
    from gadget_leicester_tpu.models.grids import grav_grid_geometry
    from gadget_leicester_tpu.ops.neighbors import build_cell_list
    from gadget_leicester_tpu.ops.pm import (ASMTH, RCUT, cic_deposit,
                                             cic_gather_vec, greens_function,
                                             pm_forces_periodic)
    from gadget_leicester_tpu.ops.softening import SOFTFAC

    fac = comoving_factors(cfg, st.ti_current)
    eps = softening_table(cfg, fac.atime)
    soft = SOFTFAC * eps[p.ptype]
    g = pmgrid
    asmth_len = ASMTH * box / g
    rcut = RCUT * asmth_len
    n_cells, cap_hint, margin = grav_grid_geometry(cfg, opts, p.n_max)
    cap = max(128, ((cap_hint + 127) // 128) * 128)
    c3 = n_cells ** 3
    print(f"SR grid: {n_cells}^3 cap {cap}  mean occ "
          f"{n_tot/c3:.0f}", flush=True)

    jbuild = jax.jit(lambda q: build_cell_list(
        q, p.alive, 0.0, box, n_cells=n_cells, capacity=cap, periodic=True))
    chained("build_cell_list (grav)", lambda s: jbuild(p.pos + s * 1e-3))

    cl = jbuild(p.pos)
    from gadget_leicester_tpu.ops.pallas_cells import (
        pack_cells_soa, shortrange_gravity_pallas_dma9)

    jpack = jax.jit(lambda q: pack_cells_soa(cl, q, p.mass, soft, p.alive))
    chained("pack_cells_soa", lambda s: jpack(p.pos + s * 1e-3))

    jsr = jax.jit(lambda q: shortrange_gravity_pallas_dma9(
        q, p.mass, soft, p.alive, float(box), n_cells=n_cells, capacity=cap,
        asmth=float(asmth_len), rcut=float(rcut), periodic=True, cl=cl)[0])
    chained("SR dma9 (pack+kernel+merge, cached cl)",
            lambda s: jsr(p.pos + s * 1e-3))

    # ---- merge idioms at [c3, K, cap] -> [N, K] scale -------------------
    out_cells = jnp.ones((c3, 8, cap), jnp.float32)
    idx = jnp.maximum(cl.cells, 0)
    valid = cl.cells >= 0
    n_p = p.pos.shape[0]
    flat_idx = jnp.where(valid, idx, n_p).reshape(-1)

    @jax.jit
    def merge_3scatter(oc):
        acc = jnp.zeros((n_p + 1, 3), jnp.float32)
        for k in range(3):
            acc = acc.at[flat_idx, k].set(oc[:, k, :].reshape(-1),
                                          mode="drop")
        return acc[:n_p]

    chained("merge 3x component scatter", lambda s: merge_3scatter(
        out_cells + s))

    @jax.jit
    def merge_rowscatter(oc):
        rows = oc[:, :3, :].transpose(0, 2, 1).reshape(-1, 3)
        acc = jnp.zeros((n_p + 1, 3), jnp.float32)
        acc = acc.at[flat_idx].set(rows, mode="drop")
        return acc[:n_p]

    chained("merge 1x row scatter [*,3]", lambda s: merge_rowscatter(
        out_cells + s))

    # gather merge: needs slot_of — build once (host-free, device argsort)
    @jax.jit
    def build_slot_of():
        cid = jnp.where(cl.cell_of >= 0, cl.cell_of, c3)
        order = jnp.argsort(cid)
        i_arr = jnp.arange(n_p, dtype=jnp.int32)
        cid_s = cid[order]
        newseg = jnp.concatenate([jnp.ones((1,), bool),
                                  cid_s[1:] != cid_s[:-1]])
        first = jax.lax.cummax(jnp.where(newseg, i_arr, 0))
        rank = i_arr - first
        return jnp.zeros((n_p,), jnp.int32).at[order].set(rank)

    slot_of = build_slot_of()
    fence(slot_of)
    gidx = jnp.where(cl.cell_of >= 0,
                     jnp.maximum(cl.cell_of, 0) * cap + slot_of, c3 * cap)

    @jax.jit
    def merge_gather(oc):
        rows = oc[:, :3, :].transpose(0, 2, 1).reshape(-1, 3)
        rows = jnp.concatenate([rows, jnp.zeros((1, 3), rows.dtype)])
        return jnp.take(rows, gidx, axis=0)

    chained("merge 1x row gather (slot_of)", lambda s: merge_gather(
        out_cells + s))

    # ---- PM --------------------------------------------------------------
    posw = jnp.mod(p.pos, box)
    mw = jnp.where(p.alive, p.mass, 0.0)

    jpm = jax.jit(lambda q: pm_forces_periodic(q, p.mass, p.alive, box, g,
                                               with_potential=True)[0])
    chained(f"PM total ({g}^3, with pot)", lambda s: jpm(p.pos + s * 1e-3))

    jdep = jax.jit(lambda q: cic_deposit(q, mw, box, g))
    chained("  PM deposit (row scatter)", lambda s: jdep(posw + s * 1e-3))

    grid = jdep(posw)

    @jax.jit
    def pm_ffts(grd):
        rho_k = jnp.fft.rfftn(grd)
        g_k = greens_function(g, box, ASMTH, dtype=grd.dtype)
        phi_k = g_k * rho_k / (box / g) ** 3
        h = box / g
        kf = 2.0 * jnp.pi / box
        kx = jnp.fft.fftfreq(g, 1.0 / g).astype(grd.dtype) * kf
        kz = jnp.arange(g // 2 + 1, dtype=grd.dtype) * kf
        KX, KY, KZ = jnp.meshgrid(kx, kx, kz, indexing="ij")
        comp = []
        for K in (KX, KY, KZ):
            mult = -1j * (8.0 * jnp.sin(K * h) - jnp.sin(2.0 * K * h)) / (6.0 * h)
            comp.append(jnp.fft.irfftn(mult * phi_k, (g, g, g)))
        comp.append(jnp.fft.irfftn(phi_k, (g, g, g)))
        return jnp.stack(comp, axis=-1)

    chained("  PM FFTs (1 fwd + 4 inv)", lambda s: pm_ffts(grid + s))
    field = pm_ffts(grid)
    jgat = jax.jit(lambda f_, q: cic_gather_vec(f_, q, box, g))
    chained("  PM gather (row)", lambda s: jgat(field, posw + s * 1e-3))

    try:
        from gadget_leicester_tpu.ops.pm_tiles import (pm_deposit_tiles,
                                                       pm_gather_tiles)
        margin_pm = margin * g / box
        jgt = jax.jit(lambda q: pm_gather_tiles(
            field, cl, q, p.alive, box=float(box), n_pm=g,
            n_cells=n_cells, margin_pm=float(margin_pm)))
        chained("  PM gather (tiles v1)", lambda s: jgt(p.pos + s * 1e-3))
        jdt = jax.jit(lambda q: pm_deposit_tiles(
            cl, q, p.mass, p.alive, box=float(box), n_pm=g,
            n_cells=n_cells, margin_pm=float(margin_pm)))
        chained("  PM deposit (tiles v1)", lambda s: jdt(p.pos + s * 1e-3))
    except Exception as e:                                    # noqa: BLE001
        print(f"  PM tiles: SKIPPED ({type(e).__name__}: {e})", flush=True)

    # ---- SPH (block backend = the auto choice on TPU) --------------------
    gas = st.gas
    ng = gas.n_gas_max
    gas_mask = p.alive[:ng] & (p.ptype[:ng] == 0)
    from gadget_leicester_tpu.models.grids import sph_blocks_geometry
    from gadget_leicester_tpu.ops.sph_blocks import (build_block_lists,
                                                     density_adaptive_blocks,
                                                     hydro_force_blocks)
    n_blocks, subcap = sph_blocks_geometry(cfg, opts, ng)
    max_hsml = 0.9 * box / (2 * n_blocks)   # (1-2*KAPPA_SPH)*subcell
    print(f"SPH blocks: {n_blocks}^3 x2 subcap {subcap}", flush=True)

    jbl = jax.jit(lambda q: build_block_lists(
        q, gas_mask, 0.0, box, n_blocks=n_blocks, subcap=subcap,
        periodic=True))
    chained("build_block_lists (sph)", lambda s: jbl(p.pos[:ng] + s * 1e-3))
    bl = jbl(p.pos[:ng])

    eps_gas = softening_table(cfg, fac.atime)[0]
    min_hsml = cfg.min_gas_hsml_fractional * SOFTFAC * eps_gas

    jdens = jax.jit(lambda q, h: density_adaptive_blocks(
        q, gas.vel_pred, p.mass[:ng], jnp.minimum(h, max_hsml),
        gas_mask, des_num_ngb=cfg.des_num_ngb,
        max_dev=cfg.max_num_ngb_deviation, box=box, n_blocks=n_blocks,
        subcap=subcap, min_hsml=min_hsml, max_hsml=max_hsml,
        cls=bl)[0])
    chained("SPH density adaptive (warm, cached bl)",
            lambda s: jdens(p.pos[:ng] + s * 1e-3, gas.hsml))
    dres = jdens(p.pos[:ng], gas.hsml)
    pressure = jnp.where(gas_mask,
                         gas.entropy_pred * dres.rho ** (5.0 / 3.0), 0.0)

    jhyd = jax.jit(lambda q: hydro_force_blocks(
        bl, q, gas.vel_pred, p.mass[:ng], dres.hsml, dres.rho, pressure,
        dres.dhsml_factor, dres.div_vel, dres.curl_vel, gas_mask,
        visc_const=cfg.art_bulk_visc_const, box=box,
        hubble_a2_flow=fac.hubble_a2_flow,
        hubble_a2_norm=fac.hubble_a2_norm, fac_mu=fac.fac_mu))
    chained("SPH hydro (cached bl)", lambda s: jhyd(p.pos[:ng] + s * 1e-3))

if __name__ == "__main__":
    main()
