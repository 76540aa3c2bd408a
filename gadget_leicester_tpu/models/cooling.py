"""Radiative cooling — Leicester-fork physics [SURVEY.md §2, UNVERIFIED-FORK:
the fork adds radiative cooling for self-gravitating protoplanetary disc
runs; the standard Leicester choices are Gammie beta-cooling and
Stamatellos et al. (2007) polytropic radiative cooling].

Pointwise per-particle physics — trivially TPU-vectorised: one masked
vector op over the gas block, folded into dt_entropy so the entropy kick
integrates it with the same KDK machinery.

beta-cooling:  du/dt = -u * Omega(R) / beta, with Omega the Keplerian
frequency about the central object (first sink slot, else the origin with
total enclosed mass approximated by the central sink mass). In entropy
variables at fixed density: dA/dt = -A * Omega / beta.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gadget_leicester_tpu.core.config import SimConfig, SimOptions
from gadget_leicester_tpu.core.state import SimState


def apply_cooling(state: SimState, cfg: SimConfig, opts: SimOptions) -> SimState:
    gas = state.gas
    p = state.p
    ng = gas.n_gas_max
    gas_mask = p.alive[:ng] & (p.ptype[:ng] == 0)

    if opts.cooling == "beta":
        # central object: first registered sink, else origin with the total
        # non-gas mass (disc-around-star setups put the star at slot 0 type 5)
        slot0 = state.sinks.slot[0]
        has_sink = slot0 >= 0
        idx = jnp.maximum(slot0, 0)
        center = jnp.where(has_sink, p.pos[idx], jnp.zeros(3, p.pos.dtype))
        m_central = jnp.where(
            has_sink,
            p.mass[idx],
            jnp.sum(jnp.where(p.alive & (p.ptype != 0), p.mass, 0.0)),
        )
        dx = p.pos[:ng] - center[None, :]
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        r = jnp.maximum(r, 1e-10)
        omega = jnp.sqrt(cfg.grav_internal * jnp.maximum(m_central, 1e-30) / r**3)
        dcool = -gas.entropy_pred * omega / cfg.cooling_beta
    elif opts.cooling == "stamatellos":
        # Stamatellos et al. (2007) polytropic cooling approximation:
        # du/dt = -(T^4 - T_bg^4) sigma_pseudo / Sigma-bar ... Full opacity
        # tables are future work; to first order treat it as beta-like with
        # the local dynamical time t_dyn = 1/sqrt(G rho):
        rho = jnp.maximum(gas.density, 1e-30)
        t_dyn_inv = jnp.sqrt(cfg.grav_internal * rho)
        dcool = -gas.entropy_pred * t_dyn_inv / cfg.cooling_beta
    else:
        return state

    dcool = jnp.where(gas_mask, dcool, 0.0)
    gas = dataclasses.replace(gas, dt_entropy=gas.dt_entropy + dcool)
    return dataclasses.replace(state, gas=gas)
