"""Feature-parity tests: forcetest oracle mode, glass making, multi-file
snapshots, output lists, cooling/sinks physics (SURVEY.md §2 fork rows)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
from gadget_leicester_tpu.models.ics import disc_ics, gassphere_ics
from gadget_leicester_tpu.models.simulation import Simulation, init_state
from tests.test_config import GASSPHERE_PARAM


def _cfg(**repl):
    txt = GASSPHERE_PARAM.replace("GravityConstantInternal  0",
                                  "GravityConstantInternal  1.0")
    for k, v in repl.items():
        txt += f"\n{k} {v}\n"
    return parse_parameter_text(txt)


def test_forcetest_mode(tmp_path):
    from gadget_leicester_tpu.utils.forcetest import (run_forcetest,
                                                      write_forcetest_file)
    cfg = _cfg(OutputDir=str(tmp_path))
    opts = SimOptions(forcetest=0.2)
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    keep = np.arange(0, len(pos), 8)
    st = init_state(cfg, opts, pos[keep], vel[keep],
                    mass[keep] * len(pos) / len(keep), ptype[keep], u=u[keep])
    res = run_forcetest(st, cfg, opts)
    # direct gravity backend => code force == oracle to f32 accuracy
    assert np.median(res["rel_err"]) < 1e-4
    assert np.max(res["rel_err"]) < 1e-2
    write_forcetest_file(res, st, cfg)
    path = os.path.join(str(tmp_path), "forcetest.txt")
    assert os.path.exists(path)
    line = open(path).readline().split()
    assert len(line) == 10


def test_make_glass():
    from gadget_leicester_tpu.models.glass import make_glass
    pos, amax = make_glass(n_side=8, box=1.0, n_steps=40)
    assert pos.shape == (512, 3)
    assert np.all((pos >= 0) & (pos < 1.0))
    # residual force decreases as the glass relaxes
    assert amax[-1] < 0.5 * amax[0]
    # uniformity: CIC density contrast shrinks vs the Poisson start
    from gadget_leicester_tpu.utils.native import cic_deposit_host
    rng = np.random.default_rng(4)
    poisson = rng.uniform(0, 1.0, (512, 3))
    d_glass = cic_deposit_host(pos, np.ones(512, np.float32), 8, 1.0)
    d_poisson = cic_deposit_host(poisson.astype(np.float32),
                                 np.ones(512, np.float32), 8, 1.0)
    assert d_glass.std() < 0.6 * d_poisson.std()


def test_multifile_snapshot_roundtrip(tmp_path, rng):
    from gadget_leicester_tpu.io.snapshot import (read_snapshot_set,
                                                  write_snapshot_set)
    from tests.test_io_snapshot import _mk_snap
    snap = _mk_snap(rng, ngas=20, nhalo=13)
    base = str(tmp_path / "multisnap")
    write_snapshot_set(base, snap, num_files=3, fmt=1)
    assert os.path.exists(base + ".0") and os.path.exists(base + ".2")
    back = read_snapshot_set(base)
    np.testing.assert_array_equal(back.header.npart, snap.header.npart)
    # particle sets equal (order may differ within type); compare by id
    o1 = np.argsort(snap.ids)
    o2 = np.argsort(back.ids)
    np.testing.assert_array_equal(back.ids[o2], snap.ids[o1])
    np.testing.assert_allclose(back.pos[o2], snap.pos[o1])
    np.testing.assert_allclose(back.mass[o2], snap.mass[o1])


def test_output_list_run(tmp_path):
    ol = tmp_path / "outputs.txt"
    ol.write_text("0.05\n0.11\n")
    cfg = _cfg(OutputDir=str(tmp_path), OutputListOn=1,
               OutputListFilename=str(ol), TimeMax=0.15,
               TimeBetSnapshot=0.0)
    sim = Simulation(cfg)
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    keep = np.arange(0, len(pos), 8)
    sim.set_ics(pos[keep], vel[keep], mass[keep] * len(pos) / len(keep),
                ptype[keep], u=u[keep])
    sim.run(max_steps=100)
    snaps = sorted(f for f in os.listdir(tmp_path) if f.startswith("snapshot"))
    assert len(snaps) == 2, snaps


def test_beta_cooling_cools():
    """Disc gas with beta-cooling must lose entropy over time."""
    from gadget_leicester_tpu.models.sinks import register_sinks_from_types
    # ArtBulkViscConst=0 isolates the cooling term (the noisy random disc
    # IC generates viscous heating that otherwise competes with it)
    cfg = _cfg(SofteningBndry=0.05, CoolingBeta=1.0, MaxSizeTimestep=0.01)
    cfg = cfg.replace(art_bulk_visc_const=0.0)
    opts = SimOptions(cooling="beta")
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = disc_ics(n_gas=400)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    sim.state = register_sinks_from_types(sim.state)
    ng = sim.state.gas.n_gas_max
    gm = np.asarray(sim.state.p.alive[:ng] & (sim.state.p.ptype[:ng] == 0))
    s0 = float(np.asarray(sim.state.gas.entropy)[gm].sum())
    for _ in range(30):
        sim.step()
    gm = np.asarray(sim.state.p.alive[:ng] & (sim.state.p.ptype[:ng] == 0))
    s1 = float(np.asarray(sim.state.gas.entropy)[gm].sum())
    assert s1 < 0.95 * s0, (s0, s1)


def test_sink_accretion_conserves_mass_momentum():
    from gadget_leicester_tpu.models.sinks import register_sinks_from_types
    cfg = _cfg(SofteningBndry=0.05, SinkAccretionRadius=0.35,
               MaxSizeTimestep=0.01)
    opts = SimOptions(sinks=True)
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = disc_ics(n_gas=400, r_in=0.2)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    sim.state = register_sinks_from_types(sim.state)
    p = sim.state.p
    alive0 = np.asarray(p.alive)
    m0 = float((np.asarray(p.mass) * alive0).sum())
    mom0 = (np.asarray(p.mass)[alive0, None] * np.asarray(p.vel)[alive0]).sum(0)
    for _ in range(20):
        sim.step()
    p = sim.state.p
    alive1 = np.asarray(p.alive)
    m1 = float((np.asarray(p.mass) * alive1).sum())
    n_acc = int(np.asarray(sim.state.sinks.n_accreted).sum())
    assert n_acc > 0, "no accretion happened in the test setup"
    assert m1 == pytest.approx(m0, rel=1e-5)
    assert alive1.sum() == alive0.sum() - n_acc


def test_bell_lin_opacity_regimes():
    """Bell & Lin (1994) piecewise opacity: regime scalings + positivity."""
    from gadget_leicester_tpu.models.cooling import bell_lin_opacity
    rho = 1e-13  # g/cm^3, disc midplane-ish
    # ice-grain regime: kappa ~ 2e-4 T^2
    k10 = float(bell_lin_opacity(jnp.asarray(rho), jnp.asarray(10.0)))
    k50 = float(bell_lin_opacity(jnp.asarray(rho), jnp.asarray(50.0)))
    assert k10 == pytest.approx(2e-4 * 10.0**2, rel=1e-5)
    assert k50 == pytest.approx(2e-4 * 50.0**2, rel=1e-5)
    # electron-scattering plateau at very high T
    khot = float(bell_lin_opacity(jnp.asarray(1e-6), jnp.asarray(1e7)))
    assert khot == pytest.approx(0.348, rel=1e-5)
    # positive and finite across a broad sweep
    t = jnp.logspace(0.5, 7, 200)
    k = bell_lin_opacity(jnp.full_like(t, 1e-10), t)
    assert bool(jnp.all(jnp.isfinite(k))) and bool(jnp.all(k > 0))


def test_stamatellos_cooling_sign():
    """Gas hotter than the background cools; colder gas heats toward it
    [Stamatellos et al. 2007 eq. 4 structure]."""
    from gadget_leicester_tpu.models.cooling import apply_cooling
    # disc_ics gas sits at ~10 K in these units; Tbg=1 K makes it clearly hot
    cfg = _cfg(SofteningBndry=0.05, MaxSizeTimestep=0.01, CoolingTbg=1.0)
    cfg = cfg.replace(art_bulk_visc_const=0.0)
    opts = SimOptions(cooling="stamatellos")
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = disc_ics(n_gas=300)
    sim.set_ics(pos, vel, mass, ptype, u=u)
    st = sim.state
    ng = st.gas.n_gas_max
    gm = np.asarray(st.p.alive[:ng] & (st.p.ptype[:ng] == 0))

    before = np.asarray(st.gas.dt_entropy)
    after = np.asarray(apply_cooling(st, cfg, opts).gas.dt_entropy)
    dcool = (after - before)[gm]
    # disc_ics u is ~ Keplerian-warm: far hotter than 10 K in these units
    assert np.all(dcool <= 0) and np.any(dcool < 0), "hot gas must cool"

    # background hotter than the gas -> radiative heating
    cfg_hot = _cfg(SofteningBndry=0.05, MaxSizeTimestep=0.01,
                   CoolingTbg=1e7)
    after_h = np.asarray(apply_cooling(st, cfg_hot, opts).gas.dt_entropy)
    dheat = (after_h - before)[gm]
    assert np.all(dheat >= 0) and np.any(dheat > 0), "cold gas must heat"


def test_sink_creation_from_collapse():
    """A dense converging bound clump forms a sink (one per sync point):
    type flips to 5, slot registered, mass conserved [Bate 1995 checks]."""
    cfg = _cfg(SofteningBndry=0.05, SinkAccretionRadius=0.1,
               SinkFormationDensity=0.5, MaxSizeTimestep=0.005)
    opts = SimOptions(sinks=True)
    sim = Simulation(cfg, opts)
    # cold Evrard sphere collapses hard through rho=0.5 quickly
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    keep = np.arange(0, len(pos), 3)
    sim.set_ics(pos[keep], vel[keep], mass[keep] * len(pos) / len(keep),
                ptype[keep], u=u[keep] * 0.01)
    m0 = float((np.asarray(sim.state.p.mass)
                * np.asarray(sim.state.p.alive)).sum())
    formed = 0
    for _ in range(400):
        sim.step()
        formed = int((np.asarray(sim.state.sinks.slot) >= 0).sum())
        if formed:
            break
    assert formed >= 1, "no sink formed during collapse"
    slot = int(np.asarray(sim.state.sinks.slot)[0])
    assert int(np.asarray(sim.state.p.ptype)[slot]) == 5
    alive = np.asarray(sim.state.p.alive)
    m1 = float((np.asarray(sim.state.p.mass) * alive).sum())
    assert m1 == pytest.approx(m0, rel=1e-5)
