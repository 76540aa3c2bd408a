"""Integer timeline utilities [G2: allvars.h TIMEBASE, timestep.c, run.c].

The reference maps the run interval [TimeBegin, TimeMax] onto an integer
timeline of 2^28 ticks; per-particle timesteps are power-of-two numbers of
ticks so that particle steps nest hierarchically ("block timesteps") and
sync points are exact integers. Comoving runs use log(a) spacing, physical
runs linear t spacing [G2: begrun.c].

All helpers here are branch-free jnp code usable inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from gadget_leicester_tpu.core.config import TIMEBASE, SimConfig


def ti_to_time(ti, cfg: SimConfig):
    """Integer tick -> scale factor a (comoving) or time t (physical)."""
    if cfg.comoving_integration_on:
        return cfg.time_begin * jnp.exp(ti * cfg.timebase_interval)
    return cfg.time_begin + ti * cfg.timebase_interval


def dt_to_ti(dt, cfg: SimConfig, time_now):
    """Physical/loga timestep -> number of ticks (float, unquantized).

    In comoving runs `dt` here is d(log a) already (the reference converts
    physical timestep criteria to dloga via dloga = dt * H(a))
    [G2: timestep.c :: get_timestep() returns dt in loga units for comoving].
    """
    del time_now
    return dt / cfg.timebase_interval


def quantize_timestep(ti_step_f, ti_current, ti_end_max=TIMEBASE):
    """Round a tick count down to a power of two that the current time
    subdivides [G2: timestep.c :: advance_and_find_timesteps()].

    A particle at integer time `ti_current` may only take a step of 2^k
    ticks if ti_current is a multiple of 2^k (hierarchical nesting).
    Returns int32 step in ticks (>= 1).
    """
    ti_step_f = jnp.clip(ti_step_f, 1.0, float(ti_end_max))
    # floor to power of two: 2^floor(log2(x))
    k = jnp.floor(jnp.log2(ti_step_f)).astype(jnp.int32)
    step = jnp.left_shift(jnp.int32(1), k.astype(jnp.int32))
    # shrink until ti_current is a multiple of step (bitwise trick):
    # the largest power-of-two divisor of ti_current is ti & -ti; if
    # ti_current==0 any step is allowed.
    ti = jnp.int32(ti_current)
    max_div = jnp.where(ti == 0, jnp.int32(ti_end_max), ti & -ti)
    step = jnp.minimum(step, max_div)
    return jnp.maximum(step, 1).astype(jnp.int32)


def min_active_ti_end(ti_endstep, alive_mask):
    """Next global sync point = min over alive particles of ti_endstep
    [G2: run.c :: find_next_sync_point_and_drift()]."""
    big = jnp.int32(2 * TIMEBASE)
    return jnp.min(jnp.where(alive_mask, ti_endstep.astype(jnp.int32), big))


def active_mask(ti_endstep, ti_current, alive_mask):
    """Particles whose step ends exactly now are 'active' (get new forces)."""
    return (ti_endstep.astype(jnp.int32) == jnp.int32(ti_current)) & alive_mask


def timebin_of(step_ticks):
    """Power-of-two bin index of a tick step (log2)."""
    return jnp.where(
        step_ticks > 0,
        jnp.floor(jnp.log2(step_ticks.astype(jnp.float32))).astype(jnp.int32),
        -1,
    )
