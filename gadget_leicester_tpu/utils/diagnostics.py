"""Energy/conservation diagnostics — rebuild of [G2: global.c ::
compute_global_quantities_of_system() / energy_statistics()] writing
``energy.txt``, the reference's primary regression signal (the rebuild's
acceptance gate is |dE/E| < 1e-3 per BASELINE.md).

Energies are evaluated at the CURRENT sync time with velocities closed to
the sync point (half-kick closure), which removes the half-step offset the
reference's energy.txt carries — strictly better as a conservation
instrument, and reducible to the reference's convention if needed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gadget_leicester_tpu.core.config import GAMMA_MINUS1, SimConfig, SimOptions
from gadget_leicester_tpu.core import cosmology
from gadget_leicester_tpu.core.state import SimState
from gadget_leicester_tpu.models.integrate import _midpoint_ti


class EnergyStats(NamedTuple):
    kinetic: jnp.ndarray
    internal: jnp.ndarray
    potential: jnp.ndarray
    total: jnp.ndarray
    momentum: jnp.ndarray   # [3]
    ang_mom: jnp.ndarray    # [3]
    mass: jnp.ndarray
    kinetic_comp: jnp.ndarray    # [6] per particle type
    internal_comp: jnp.ndarray   # [6]
    potential_comp: jnp.ndarray  # [6]
    mass_comp: jnp.ndarray       # [6]


@partial(jax.jit, static_argnames=("cfg", "opts"))
def energy_statistics(state: SimState, cfg: SimConfig, opts: SimOptions) -> EnergyStats:
    p, gas = state.p, state.gas
    ng = gas.n_gas_max
    m = jnp.where(p.alive, p.mass, 0.0)

    # close velocities to the sync point (from each particle's midpoint;
    # PM contribution from the global PM midpoint)
    mid = _midpoint_ti(p.ti_begstep, p.ti_endstep)
    dt_gk = cosmology.gravkick_factor(None, cfg, mid, state.ti_current)
    dt_hk = cosmology.hydrokick_factor(None, cfg, mid, state.ti_current)
    pm_mid = _midpoint_ti(state.pm_ti_begstep, state.pm_ti_endstep)
    dt_gk_pm = cosmology.gravkick_factor(None, cfg, pm_mid, state.ti_current)
    hyd = jnp.zeros_like(p.acc).at[:ng].set(gas.hydro_acc)
    vel_sync = (p.vel + p.acc * dt_gk[:, None] + p.acc_pm * dt_gk_pm
                + hyd * dt_hk[:, None])

    ke = 0.5 * jnp.sum(m * jnp.sum(vel_sync**2, axis=-1))
    pe = 0.5 * jnp.sum(m * p.pot)

    gas_mask = p.alive[:ng] & (p.ptype[:ng] == 0)
    rho_safe = jnp.where(gas.density > 0, gas.density, 1.0)
    dt_entr = (state.ti_current - p.ti_begstep[:ng]) * cfg.timebase_interval
    a_now = gas.entropy + gas.dt_entropy * dt_entr
    if opts.isotherm_eqs:
        u = a_now / GAMMA_MINUS1  # c_s^2/(gamma-1) bookkeeping value
    else:
        # entropy -> u with PHYSICAL density [G2: global.c EnergyInt +=
        # Mass * Entropy/GAMMA_MINUS1 * pow(Density/a3, GAMMA_MINUS1)]
        from gadget_leicester_tpu.models.forces import comoving_factors
        a3inv = comoving_factors(cfg, state.ti_current).a3inv
        u = a_now * (rho_safe * a3inv)**GAMMA_MINUS1 / GAMMA_MINUS1
    ie = jnp.sum(jnp.where(gas_mask, m[:ng] * u, 0.0))

    mom = jnp.sum(m[:, None] * vel_sync, axis=0)
    ang = jnp.sum(m[:, None] * jnp.cross(p.pos, vel_sync), axis=0)

    # per-type decomposition [G2: compute_global_quantities_of_system()]
    seg = jnp.where(p.alive, p.ptype, 6)
    ke_i = 0.5 * m * jnp.sum(vel_sync**2, axis=-1)
    pe_i = 0.5 * m * p.pot
    ie_i = jnp.zeros_like(m).at[:ng].set(
        jnp.where(gas_mask, m[:ng] * u, 0.0))
    ke_c = jax.ops.segment_sum(ke_i, seg, num_segments=7)[:6]
    pe_c = jax.ops.segment_sum(pe_i, seg, num_segments=7)[:6]
    ie_c = jax.ops.segment_sum(ie_i, seg, num_segments=7)[:6]
    m_c = jax.ops.segment_sum(m, seg, num_segments=7)[:6]
    return EnergyStats(
        kinetic=ke, internal=ie, potential=pe, total=ke + ie + pe,
        momentum=mom, ang_mom=ang, mass=jnp.sum(m),
        kinetic_comp=ke_c, internal_comp=ie_c, potential_comp=pe_c,
        mass_comp=m_c,
    )


def format_energy_line(time: float, st: EnergyStats) -> str:
    """One energy.txt-style line: time, Etot, Eint, Epot, Ekin."""
    return (
        f"{time:.8g} {float(st.total):.8g} {float(st.internal):.8g} "
        f"{float(st.potential):.8g} {float(st.kinetic):.8g}"
    )


class LayzerIrvineTracker:
    """Cosmic energy (Layzer-Irvine) conservation instrument for comoving
    runs — the rebuild of the accuracy check GADGET users apply to
    [G2: global.c :: energy_statistics()] output (Springel 2005 §5).

    With internal velocities vel = a^2 dx/dt and comoving potential
    phi_c = p.pot, the peculiar energies are

        T = 0.5 sum m (vel/a)^2      (peculiar kinetic)
        W = 0.5 sum m phi_c / a      (peculiar potential)
        U = sum m u_phys             (thermal; gamma = 5/3)

    and the cosmic energy equation d(T+W+U)/dln a = -(2T + W + 2U)
    makes E_LI = T + W + U + INT (2T + W + 2U) dln a  a conserved
    quantity. ``update(a, stats)`` trapezoid-accumulates the integral and
    returns the relative drift |E_LI - E_LI(a0)| / |W| — the
    BASELINE.json gate is drift < 1e-3 on the flagship config.
    """

    def __init__(self):
        self._prev = None          # (ln a, integrand)
        self._integral = 0.0
        self._e0 = None

    def update(self, a: float, stats: EnergyStats) -> float:
        import math
        a = float(a)
        t = float(stats.kinetic) / a**2
        w = float(stats.potential) / a
        u = float(stats.internal)
        integrand = 2.0 * t + w + 2.0 * u
        lna = math.log(a)
        if self._prev is not None:
            lna0, i0 = self._prev
            self._integral += 0.5 * (integrand + i0) * (lna - lna0)
        self._prev = (lna, integrand)
        e = t + w + u + self._integral
        if self._e0 is None:
            self._e0 = e
        wnorm = max(abs(w), 1e-30)
        return abs(e - self._e0) / wnorm
