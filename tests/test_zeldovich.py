"""Zeldovich pancake — analytic validation of the comoving TreePM stack.

In an Einstein-de-Sitter universe a single plane-wave perturbation evolves
exactly (before shell crossing) as

    x(q, a) = q + D(a) psi_i(q) / D(a_i),   D(a) = a (EdS growing mode),
    psi_i(q) = A_i sin(k q)

This exercises, end-to-end: comoving drift/kick factor quadrature, the
PM+short-range gravity split, GADGET velocity conventions (v_file =
v_pec/sqrt(a)), and the KDK integrator — any factor error shows up as a
wrong growth rate. The standard cosmological-code validation problem.
"""

import numpy as np
import pytest

from gadget_leicester_tpu.core.config import SimOptions, parse_parameter_text


def _pancake_setup(n_side=16, box=100.0, a_i=0.05, a_cross=0.5):
    """Plane-wave IC at a_i; caustic at a_cross (A_cross = 1/k)."""
    k = 2 * np.pi / box
    a_amp_i = (a_i / a_cross) / k  # A(a) = a/(a_cross k)
    g = (np.arange(n_side) + 0.5) / n_side * box
    q = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    psi = a_amp_i * np.sin(k * q[:, 0])
    pos = q.copy()
    pos[:, 0] = np.mod(q[:, 0] + psi, box)
    return q, pos, psi, k


@pytest.mark.slow
def test_zeldovich_growth():
    n_side, box = 16, 100.0
    a_i, a_cross, a_f = 0.05, 0.5, 0.2
    param = f"""
InitCondFile x
OutputDir /tmp/zel
TimeBegin {a_i}
TimeMax   {a_f}
ComovingIntegrationOn 1
PeriodicBoundariesOn 1
BoxSize   {box}
Omega0    1.0
OmegaLambda 0.0
HubbleParam 1.0
GravityConstantInternal 43007.1
UnitLength_in_cm         3.085678e21
UnitMass_in_g            1.989e43
UnitVelocity_in_cm_per_s 1e5
MaxSizeTimestep 0.02
SofteningHalo {box / n_side / 30}
SofteningHaloMaxPhys {box / n_side / 30}
"""
    cfg = parse_parameter_text(param)
    opts = SimOptions(periodic=True, pmgrid=2 * n_side, gravity_mode="treepm")

    q, pos, psi_i, k = _pancake_setup(n_side, box, a_i, a_cross)
    n = len(pos)
    # critical density for EdS closure: rho_crit = 3 H0^2/(8 pi G)
    h0 = cfg.hubble_internal
    rho_crit = 3.0 * h0**2 / (8.0 * np.pi * cfg.grav_internal)
    mass = np.full(n, rho_crit * box**3 / n)
    # Zeldovich velocity: v_pec = a H(a) f psi, f = 1 (EdS);
    # file convention v_file = v_pec / sqrt(a)
    h_a = h0 * a_i**-1.5
    vel = np.zeros((n, 3))
    vel[:, 0] = a_i * h_a * psi_i / np.sqrt(a_i)

    from gadget_leicester_tpu.models.simulation import Simulation
    sim = Simulation(cfg, opts)
    sim.set_ics(pos, vel, mass, np.ones(n, np.int32))
    sim.run_until(a_f, max_steps=500)
    a_now = sim.time
    assert a_now >= a_f * 0.999

    # analytic positions at a_now
    psi_now = psi_i * (a_now / a_i)
    x_exact = np.mod(q[:, 0] + psi_now, box)
    x_sim = np.asarray(sim.state.p.pos)[: n, 0][
        np.argsort(np.asarray(sim.state.p.pid)[:n])]
    x_exact = x_exact[np.argsort(np.arange(1, n + 1))]  # ids assigned in order

    dx = x_sim - x_exact
    dx = dx - box * np.round(dx / box)
    amp = np.abs(psi_now).max()
    rel = np.abs(dx).max() / amp
    rms = np.sqrt((dx**2).mean()) / amp
    # growth tracked to a few % of the displacement amplitude
    assert rms < 0.05, f"Zeldovich rms displacement error {rms}"
    assert rel < 0.15, f"Zeldovich max displacement error {rel}"
    # transverse displacements stay zero
    yz = np.asarray(sim.state.p.pos)[:n, 1:] - q[:, 1:]
    yz = yz - box * np.round(yz / box)
    assert np.abs(yz).max() < 0.02 * amp
