"""Sink/accretion particles — Leicester-fork physics [SURVEY.md §2,
UNVERIFIED-FORK: accretion-radius sink checks a la Bate et al. 1995].

A sink is a collisionless particle registered in ``SinkState.slot``. Each
sync point, gas particles inside a sink's accretion radius that are bound
and approaching are accreted: their mass and momentum transfer to the sink
and they are masked dead (``alive=False``) — the TPU rebuild of particle
removal is masking, never compaction (static shapes).

Vectorised as an [S, Ng] distance/criteria matrix (S = sink capacity is
small and static), with conservation-exact mass/momentum transfer.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gadget_leicester_tpu.core.config import SimConfig, SimOptions
from gadget_leicester_tpu.core.state import SimState


def register_sinks_from_types(state: SimState, sink_type: int = 5) -> SimState:
    """Mark all particles of `sink_type` as sinks (host-side setup helper)."""
    import numpy as np
    ptype = np.asarray(state.p.ptype)
    alive = np.asarray(state.p.alive)
    idx = np.where((ptype == sink_type) & alive)[0]
    s = state.sinks
    cap = s.slot.shape[0]
    slot = np.full(cap, -1, np.int32)
    slot[: min(len(idx), cap)] = idx[:cap]
    sinks = dataclasses.replace(s, slot=jnp.asarray(slot))
    return dataclasses.replace(state, sinks=sinks)


def accrete_onto_sinks(state: SimState, cfg: SimConfig, opts: SimOptions) -> SimState:
    if cfg.sink_accretion_radius <= 0:
        return state
    p, gas, sinks = state.p, state.gas, state.sinks
    ng = gas.n_gas_max
    gas_mask = p.alive[:ng] & (p.ptype[:ng] == 0)

    s_valid = sinks.slot >= 0                       # [S]
    s_idx = jnp.maximum(sinks.slot, 0)
    s_pos = p.pos[s_idx]                            # [S,3]
    s_vel = p.vel[s_idx]
    s_mass = p.mass[s_idx]

    dx = s_pos[:, None, :] - p.pos[None, :ng, :]    # [S,Ng,3]
    r2 = jnp.sum(dx * dx, axis=-1)
    dv = s_vel[:, None, :] - p.vel[None, :ng, :]
    # criteria [Bate et al. 1995 style]: inside r_acc, approaching, bound
    inside = r2 < cfg.sink_accretion_radius**2
    approaching = jnp.sum(dv * dx, axis=-1) < 0     # moving toward sink... sign:
    # (v_gas - v_sink) . (x_gas - x_sink) < 0  <=>  (dv).(dx) < 0 with our defs
    r = jnp.sqrt(jnp.maximum(r2, 1e-20))
    v2 = jnp.sum(dv * dv, axis=-1)
    bound = 0.5 * v2 < cfg.grav_internal * s_mass[:, None] / r
    take = inside & approaching & bound & gas_mask[None, :] & s_valid[:, None]

    # a gas particle goes to the NEAREST claiming sink only
    big = jnp.asarray(1e30, r2.dtype)
    r2m = jnp.where(take, r2, big)
    winner = jnp.argmin(r2m, axis=0)                # [Ng]
    any_take = jnp.any(take, axis=0)                # [Ng]
    claim = (jnp.arange(sinks.slot.shape[0])[:, None] == winner[None, :]) & any_take[None, :]

    m_g = jnp.where(gas_mask, p.mass[:ng], 0.0)
    dm = jnp.sum(jnp.where(claim, m_g[None, :], 0.0), axis=1)            # [S]
    dp = jnp.einsum("sn,nc->sc", jnp.where(claim, m_g[None, :], 0.0),
                    p.vel[:ng])                                          # [S,3]
    n_acc = jnp.sum(claim, axis=1).astype(jnp.int32)

    # update sink particles (conserve mass + momentum)
    new_mass = s_mass + dm
    new_vel = (s_mass[:, None] * s_vel + dp) / jnp.maximum(new_mass, 1e-30)[:, None]
    mass_upd = p.mass.at[s_idx].set(jnp.where(s_valid, new_mass, p.mass[s_idx]))
    vel_upd = p.vel.at[s_idx].set(jnp.where(s_valid[:, None], new_vel, p.vel[s_idx]))

    # kill accreted gas
    alive = p.alive.at[:ng].set(p.alive[:ng] & ~any_take)

    p = dataclasses.replace(p, mass=mass_upd, vel=vel_upd, alive=alive)
    sinks = dataclasses.replace(
        sinks,
        acc_mass=sinks.acc_mass + dm,
        n_accreted=sinks.n_accreted + n_acc,
    )
    return dataclasses.replace(state, p=p, sinks=sinks)
