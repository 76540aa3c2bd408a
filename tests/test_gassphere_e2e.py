"""End-to-end Evrard collapse (gassphere workload) — the minimum full-stack
slice: direct gravity + adaptive-h SPH + KDK individual timesteps
(SURVEY.md §7 step 3).

Acceptance criteria mirror the reference's physics-level validation
(SURVEY.md §4): energy conservation |dE/E| small, momentum ~0, and the
qualitative Evrard solution (collapse: PE drops, thermal energy rises as
the central shock forms, virialisation later).
"""

import numpy as np
import pytest

from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text
from gadget_leicester_tpu.models.ics import gassphere_ics
from gadget_leicester_tpu.models.simulation import Simulation
from gadget_leicester_tpu.utils.diagnostics import energy_statistics
from tests.test_config import GASSPHERE_PARAM


def _gassphere_cfg():
    # G = 1 units for the Evrard problem (M = R = 1)
    txt = (GASSPHERE_PARAM
           .replace("GravityConstantInternal  0",
                    "GravityConstantInternal  1.0")
           .replace("MaxSizeTimestep     0.03", "MaxSizeTimestep     0.02"))
    return parse_parameter_text(txt)


@pytest.fixture(scope="module")
def evrard_run():
    cfg = _gassphere_cfg()
    opts = SimOptions(periodic=False)
    sim = Simulation(cfg, opts)
    pos, vel, mass, ptype, u = gassphere_ics(mode="grid")
    # keep the test light: subsample the lattice
    keep = np.arange(0, len(pos), 3)
    sim.set_ics(pos[keep], vel[keep], mass[keep] * len(pos) / len(keep),
                ptype[keep], u=u[keep])
    e0 = energy_statistics(sim.state, cfg, opts)
    energies = [(0.0, e0)]
    while sim.time < 0.5 and sim.step_count < 2000:
        sim.step()
        if sim.step_count % 10 == 0:
            energies.append((sim.time, energy_statistics(sim.state, cfg, opts)))
    energies.append((sim.time, energy_statistics(sim.state, cfg, opts)))
    return cfg, opts, sim, energies


def test_initial_energies_sane(evrard_run):
    cfg, opts, sim, energies = evrard_run
    t0, e0 = energies[0]
    # Evrard sphere: analytic PE = -3GM^2/(5-2n)R with rho~r^-1 -> -2/3 GM^2/R
    assert float(e0.potential) == pytest.approx(-2.0 / 3.0, rel=0.08)
    # thermal energy = 0.05 per unit mass
    assert float(e0.internal) == pytest.approx(0.05, rel=0.05)
    assert float(e0.kinetic) < 1e-6


def test_collapse_proceeds(evrard_run):
    cfg, opts, sim, energies = evrard_run
    tN, eN = energies[-1]
    t0, e0 = energies[0]
    assert tN >= 0.5
    # by t=0.5 the sphere is collapsing: PE decreases, KE grows
    assert float(eN.potential) < float(e0.potential) - 0.05
    assert float(eN.kinetic) > 0.01


def test_energy_conservation(evrard_run):
    """|dE/E_char| < 1e-2 through early collapse at this resolution.

    (The 1e-3 BASELINE gate applies to lcdm_gas at production resolution;
    Evrard at ~500 particles with ~0.05 softening has a larger but still
    bounded drift — tightened empirically once calibrated.)
    """
    cfg, opts, sim, energies = evrard_run
    e_tot = np.array([float(e.total) for _, e in energies])
    drift = np.max(np.abs(e_tot - e_tot[0]))
    assert drift < 0.02, f"energy drift {drift}"


def test_momentum_conservation(evrard_run):
    cfg, opts, sim, energies = evrard_run
    _, eN = energies[-1]
    mom = np.asarray(eN.momentum)
    assert np.all(np.abs(mom) < 5e-4), mom


def test_mass_conserved(evrard_run):
    cfg, opts, sim, energies = evrard_run
    _, e0 = energies[0]
    _, eN = energies[-1]
    assert float(eN.mass) == pytest.approx(float(e0.mass), rel=1e-6)


def test_density_profile_centrally_concentrated(evrard_run):
    cfg, opts, sim, energies = evrard_run
    st = sim.state
    ng = st.gas.n_gas_max
    gas_mask = np.asarray(st.p.alive[:ng] & (st.p.ptype[:ng] == 0))
    pos = np.asarray(st.p.pos[:ng])[gas_mask]
    rho = np.asarray(st.gas.density)[gas_mask]
    r = np.linalg.norm(pos, axis=1)
    inner = rho[r < 0.2].mean()
    outer = rho[(r > 0.5) & (r < 1.0)].mean()
    assert inner > 3 * outer
