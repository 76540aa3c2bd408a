"""KDK leapfrog with individual power-of-two block timesteps.

Rebuild of [G2: predict.c :: move_particles()/drift_particle()] and
[G2: timestep.c :: advance_and_find_timesteps()/get_timestep()] as masked
full-width vector updates: every particle is touched by wide vector ops,
but only ACTIVE particles (ti_endstep == ti_current) receive kicks and new
timesteps — "inactive particles cost nothing" becomes "inactive lanes are
masked" (the active-set gather optimisation lives a level up, in the
bench/step driver).

Velocity convention (leapfrog): ``p.vel`` holds the velocity at the
midpoint of each particle's current step (after its opening half-kick);
``gas.vel_pred`` extrapolates to the current sync time for SPH pair terms
[G2: predict.c VelPred].
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gadget_leicester_tpu.core.config import (GAMMA, GAMMA_MINUS1, TIMEBASE,
                                              SimConfig, SimOptions)
from gadget_leicester_tpu.core import cosmology, timeline
from gadget_leicester_tpu.core.state import SimState
from gadget_leicester_tpu.models.forces import comoving_factors, softening_table


def _midpoint_ti(ti_beg, ti_end):
    """Tick of a particle's last half-kick = midpoint of its current step."""
    return ti_beg + (ti_end - ti_beg) // 2


# ---------------------------------------------------------------------------
# Drift [G2: predict.c]
# ---------------------------------------------------------------------------
def drift_all(state: SimState, cfg: SimConfig, opts: SimOptions, ti_next) -> SimState:
    """Drift ALL particles from ti_current to ti_next.

    pos += vel * drift_factor; SPH predicted quantities updated:
      VelPred_i  = vel + (grav_acc * gravkick + hydro_acc * hydrokick)
                   from the particle's own midpoint to ti_next
      rho, hsml  evolved with div v [G2: predict.c drift_particle()]
      entropy_pred = entropy + dt_entropy * dt
    """
    p, gas = state.p, state.gas
    ti0 = state.ti_current
    dt_drift = cosmology.drift_factor(None, cfg, ti0, ti_next)

    dx = p.vel * dt_drift
    pos = p.pos + dx
    if opts.periodic and cfg.box_size > 0:
        pos = jnp.mod(pos, cfg.box_size)
    pos = jnp.where(p.alive[:, None], pos, p.pos)
    p = dataclasses.replace(p, pos=pos)
    grids = state.grids
    if grids is not None:
        # staleness bookkeeping for the cached neighbour grids: the max
        # per-particle displacement of this drift bounds how far any
        # assignment can go stale (models.grids coverage guarantee)
        from gadget_leicester_tpu.models.grids import note_drift
        step_max = jnp.max(jnp.where(
            p.alive, jnp.max(jnp.abs(dx), axis=-1), 0.0))
        grids = note_drift(grids, step_max)
        state = dataclasses.replace(state, grids=grids)

    ng = gas.n_gas_max
    # per-gas-particle kick factors from its own midpoint to ti_next
    mid = _midpoint_ti(p.ti_begstep[:ng], p.ti_endstep[:ng])
    dt_gk = cosmology.gravkick_factor(None, cfg, mid, ti_next)
    dt_hk = cosmology.hydrokick_factor(None, cfg, mid, ti_next)
    # long-range PM prediction from the (global) PM midpoint
    pm_mid = _midpoint_ti(state.pm_ti_begstep, state.pm_ti_endstep)
    dt_gk_pm = cosmology.gravkick_factor(None, cfg, pm_mid, ti_next)
    vel_pred = (
        p.vel[:ng]
        + p.acc[:ng] * dt_gk[:, None]
        + p.acc_pm[:ng] * dt_gk_pm
        + gas.hydro_acc * dt_hk[:, None]
    )
    # dt for entropy prediction runs from the START of the particle's step
    # (entropy is defined at step starts, not midpoints) [G2: predict.c]
    dt_entr = (ti_next - p.ti_begstep[:ng]) * cfg.timebase_interval
    entropy_pred = gas.entropy + gas.dt_entropy * dt_entr
    # same half-loss clamp as the kick (stiff cooling must not drive the
    # predicted entropy through zero) [G2: timestep.c DtEntropy limiter]
    entropy_pred = jnp.maximum(entropy_pred, 0.5 * gas.entropy)
    # local density/hsml forecast [G2: drift_particle]:
    #   rho *= exp(-divv * dt_drift_particle) ; hsml *= exp(divv/3 * dt)
    ddt = dt_drift  # scalar
    rho = gas.density * jnp.exp(-gas.div_vel * ddt)
    hsml = gas.hsml * jnp.exp(gas.div_vel / 3.0 * ddt)
    hsml = jnp.maximum(hsml, 1e-30)
    if opts.isotherm_eqs:
        pressure = entropy_pred * rho
    else:
        pressure = entropy_pred * rho**GAMMA
    gas = dataclasses.replace(
        gas, vel_pred=vel_pred, entropy_pred=entropy_pred,
        density=rho, hsml=hsml, pressure=pressure,
    )
    return dataclasses.replace(state, p=p, gas=gas, ti_current=jnp.asarray(ti_next, jnp.int32))


# ---------------------------------------------------------------------------
# Timestep criterion [G2: timestep.c :: get_timestep()]
# ---------------------------------------------------------------------------
def get_timesteps(state: SimState, cfg: SimConfig, opts: SimOptions):
    """Per-particle timestep in timeline units (dloga comoving / dt physical),
    NOT yet quantized. Criterion 0 (standard):

      collisionless:  dt = sqrt(2 eta eps / |a|)
      gas:            additionally Courant dt_c = 2 C h / v_sig_max

    with comoving conversion factors fac1/fac2/fac3 and the final * H(a)
    to dloga, exactly as [G2: timestep.c].
    """
    p, gas = state.p, state.gas
    ng = gas.n_gas_max
    fac = comoving_factors(cfg, state.ti_current)
    if cfg.comoving_integration_on:
        fac1 = 1.0 / (fac.atime * fac.atime)
        fac2 = 1.0 / fac.atime ** (3.0 * GAMMA - 2.0)
        fac3 = fac.atime ** (3.0 * (1.0 - GAMMA) / 2.0)
        hubble_a = fac.hubble_a
    else:
        fac1 = fac2 = fac3 = hubble_a = 1.0

    # physical acceleration: VECTOR sum of gravity + hydro before the norm
    # [G2: timestep.c ac = fac1*GravAccel + fac2*HydroAccel, then |ac|]
    acc_vec = (p.acc + p.acc_pm) * fac1
    hyd = jnp.zeros_like(p.acc).at[:ng].set(gas.hydro_acc * fac2)
    is_gas = (p.ptype == 0)
    acc_vec = acc_vec + jnp.where(is_gas[:, None], hyd, 0.0)
    ac = jnp.sqrt(jnp.sum(acc_vec * acc_vec, axis=-1))
    ac = jnp.maximum(ac, 1e-30)

    eps = softening_table(cfg, fac.atime)[p.ptype]
    dt_grav = jnp.sqrt(2.0 * cfg.err_tol_int_accuracy * fac.atime * eps / ac)

    dt = dt_grav
    # Courant for gas
    msv = jnp.maximum(gas.max_signal_vel, 1e-30)
    dt_courant = 2.0 * cfg.courant_fac * fac.atime * gas.hsml / (fac3 * msv)
    dt_c_full = jnp.full_like(dt, jnp.inf).at[:ng].set(dt_courant)
    dt = jnp.where(is_gas, jnp.minimum(dt, dt_c_full), dt)

    # convert to timeline units (dloga for comoving) and clamp
    dt = dt * hubble_a
    if opts.cooling != "none":
        # cooling criterion: bound |dA| to ~30% of A per step (dt_entropy
        # already includes the radiative term — cooling runs before the
        # timestep update in sync_point_step)
        a_safe = jnp.maximum(gas.entropy, 1e-30)
        dt_cool = 0.3 * a_safe / jnp.maximum(jnp.abs(gas.dt_entropy), 1e-30)
        dt_cool_full = jnp.full_like(dt, jnp.inf).at[:ng].set(dt_cool)
        dt = jnp.where(is_gas, jnp.minimum(dt, dt_cool_full), dt)
    dt = jnp.clip(dt, cfg.min_size_timestep, cfg.max_size_timestep)
    return dt


def advance_and_find_timesteps(state: SimState, cfg: SimConfig,
                               opts: SimOptions) -> SimState:
    """Close-and-open KDK kicks + new step assignment for ACTIVE particles
    [G2: timestep.c :: advance_and_find_timesteps()].

    For each active particle (ti_endstep == ti_current):
      * choose new step, quantize to a power of two that nests at ti_current
      * kick velocity with gravkick(mid_old -> now) + gravkick(now -> mid_new)
        (hydro part with hydrokick factors)
      * advance entropy across [beg_old, now] ... actually the entropy kick
        spans from the old step's midpoint-entropy time: GADGET integrates
        entropy over [ti_begstep + old/2, ti_current + new/2]
      * ti_begstep = ti_current; ti_endstep += new step
    """
    p, gas = state.p, state.gas
    ng = gas.n_gas_max
    ti_now = state.ti_current
    active = timeline.active_mask(p.ti_endstep, ti_now, p.alive)

    dt_timeline = get_timesteps(state, cfg, opts)
    ti_step_f = dt_timeline / cfg.timebase_interval
    # don't step past the end of the timeline
    ti_step_f = jnp.minimum(ti_step_f, (TIMEBASE - ti_now).astype(ti_step_f.dtype))
    ti_step = timeline.quantize_timestep(ti_step_f, ti_now)
    ti_step = jnp.minimum(ti_step, jnp.int32(TIMEBASE) - ti_now)
    ti_step = jnp.maximum(ti_step, 1)

    old_mid = _midpoint_ti(p.ti_begstep, p.ti_endstep)
    new_mid = ti_now + ti_step // 2

    # closing kick (old midpoint -> now) + opening kick (now -> new midpoint)
    dt_gk = (
        cosmology.gravkick_factor(None, cfg, old_mid, ti_now)
        + cosmology.gravkick_factor(None, cfg, ti_now, new_mid)
    )
    dt_hk = (
        cosmology.hydrokick_factor(None, cfg, old_mid, ti_now)
        + cosmology.hydrokick_factor(None, cfg, ti_now, new_mid)
    )
    hyd_full = jnp.zeros_like(p.acc).at[:ng].set(gas.hydro_acc)
    is_gas = (p.ptype == 0)
    vel_new = (
        p.vel
        + p.acc * dt_gk[:, None]
        + jnp.where(is_gas[:, None], hyd_full * dt_hk[:, None], 0.0)
    )
    vel = jnp.where(active[:, None], vel_new, p.vel)

    # entropy advance over [old_mid_entropy, new_mid_entropy]:
    # GADGET advances Entropy by DtEntropy * (ti_current + new/2 - (beg + old/2))
    # * Timebase_interval [G2: timestep.c]
    dt_entr = (new_mid - old_mid).astype(gas.entropy.dtype)[:ng] * cfg.timebase_interval
    active_g = active[:ng]
    entropy_new = gas.entropy + gas.dt_entropy * dt_entr
    # stiff-cooling guard [G2: timestep.c DtEntropy limiter]: entropy may
    # not drop by more than half over one interval
    entropy_new = jnp.maximum(entropy_new, 0.5 * gas.entropy)
    # entropy floor [G2: MinEgySpec -> min entropy; also DtEntropy limiter]
    if cfg.min_gas_temp > 0:
        from gadget_leicester_tpu.models.forces import comoving_factors
        a3inv_floor = comoving_factors(cfg, ti_now).a3inv
        min_entropy = _min_entropy(cfg, gas.density * a3inv_floor)
        # floor only where a real density exists — a zero (dropped /
        # never-solved) density would send the floor to infinity
        entropy_new = jnp.where(gas.density > 0,
                                jnp.maximum(entropy_new, min_entropy),
                                entropy_new)
    entropy = jnp.where(active_g, entropy_new, gas.entropy)

    ti_beg = jnp.where(active, ti_now, p.ti_begstep)
    ti_end = jnp.where(active, ti_now + ti_step, p.ti_endstep)

    p = dataclasses.replace(p, vel=vel, ti_begstep=ti_beg, ti_endstep=ti_end)
    gas = dataclasses.replace(gas, entropy=entropy)
    return dataclasses.replace(state, p=p, gas=gas)


def pm_step_update(state: SimState, cfg: SimConfig, opts: SimOptions,
                   is_pm_step, axis_name=None, pm_box=None) -> SimState:
    """PM-step kick + new PM interval [G2: timestep.c PM part].

    At PM steps (ti_current == pm_ti_endstep) ALL particles receive the
    long-range kick closing the old PM half-step and opening the new one;
    the new global PM step is bounded by the rms-displacement criterion
    dt <= MaxRMSDisplacementFac * (Box/PMGRID) / v_rms and MaxSizeTimestep.
    Everything is masked by `is_pm_step` (traced bool) — cheap O(N) math.
    """
    p = state.p
    ti_now = state.ti_current
    fac = comoving_factors(cfg, ti_now)

    # rms velocity of alive particles (internal units; psum over the mesh
    # axis when called inside the SPMD shard_map step)
    m = jnp.where(p.alive, p.mass, 0.0)
    v2 = jnp.sum(p.vel * p.vel, axis=-1)
    mv2_sum, m_sum = jnp.sum(m * v2), jnp.sum(m)
    if axis_name is not None:
        import jax
        mv2_sum = jax.lax.psum(mv2_sum, axis_name)
        m_sum = jax.lax.psum(m_sum, axis_name)
    vrms = jnp.sqrt(mv2_sum / jnp.maximum(m_sum, 1e-37))
    vrms = jnp.maximum(vrms, 1e-30)
    # PM mesh-cell size: cfg.box_size normally; vacuum SPMD passes the
    # static domain extent (cfg.box_size may be 0 in vacuum runs)
    mesh_span = cfg.box_size if pm_box is None else pm_box
    dsp = cfg.max_rms_displacement_fac * mesh_span / max(opts.pmgrid, 1)
    if cfg.comoving_integration_on:
        # comoving displacement dx = vel * int dt/a^2 ~ vel * dloga/(a^2 H)
        dt = dsp * fac.atime**2 * fac.hubble_a / vrms
    else:
        dt = dsp / vrms
    dt = jnp.clip(dt, cfg.min_size_timestep, cfg.max_size_timestep)
    ti_step_f = dt / cfg.timebase_interval
    ti_step_f = jnp.minimum(ti_step_f, (TIMEBASE - ti_now).astype(ti_step_f.dtype))
    ti_step = timeline.quantize_timestep(ti_step_f, ti_now)
    ti_step = jnp.maximum(jnp.minimum(ti_step, jnp.int32(TIMEBASE) - ti_now), 1)

    old_mid = _midpoint_ti(state.pm_ti_begstep, state.pm_ti_endstep)
    new_mid = ti_now + ti_step // 2
    dt_gk = (cosmology.gravkick_factor(None, cfg, old_mid, ti_now)
             + cosmology.gravkick_factor(None, cfg, ti_now, new_mid))
    vel_new = p.vel + p.acc_pm * dt_gk
    vel = jnp.where((is_pm_step & p.alive)[:, None], vel_new, p.vel)
    pm_beg = jnp.where(is_pm_step, ti_now, state.pm_ti_begstep)
    pm_end = jnp.where(is_pm_step, ti_now + ti_step, state.pm_ti_endstep)
    p = dataclasses.replace(p, vel=vel)
    return dataclasses.replace(
        state, p=p,
        pm_ti_begstep=jnp.asarray(pm_beg, jnp.int32),
        pm_ti_endstep=jnp.asarray(pm_end, jnp.int32))


def _min_entropy(cfg: SimConfig, rho):
    """Entropy floor from MinGasTemp [G2: init.c MinEgySpec computation].
    ``rho`` must be the PHYSICAL density (comoving * a3inv)."""
    from gadget_leicester_tpu.core.config import (BOLTZMANN_CGS,
                                                  HYDROGEN_MASSFRAC,
                                                  PROTONMASS_CGS)
    mean_mol = 4.0 / (1.0 + 3.0 * HYDROGEN_MASSFRAC)  # neutral
    min_egy = (
        BOLTZMANN_CGS / PROTONMASS_CGS * cfg.min_gas_temp / mean_mol
        / GAMMA_MINUS1 / cfg.unit_velocity_in_cm_per_s**2
    )
    rho_safe = jnp.maximum(rho, 1e-30)
    return GAMMA_MINUS1 * min_egy / rho_safe**GAMMA_MINUS1
