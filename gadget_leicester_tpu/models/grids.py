"""Persistent stale-tolerant neighbour grids — the rebuild of the
reference's *occasional* domain/tree rebuild cadence
[G2: domain.c :: domain_Decomposition() triggered every
TreeDomainUpdateFrequency * N force computations; forcetree.c drifts node
centres between rebuilds].

The reference does NOT rebuild its tree every sync point: it tolerates
slightly stale node geometry and re-decomposes only on a cadence. The
TPU equivalent: the uniform-grid CELL ASSIGNMENTS (the product of the
O(N log N) sort in build_cell_list / build_block_lists) are cached in the
SimState and reused across sync points; pair forces always read FRESH
positions, so the physics of found pairs is exact — staleness only
affects *which* pairs the stencil can see.

Coverage guarantee. A pair within interaction range ``r_int`` is found iff
the two ASSIGNED cells differ by <= 1 per axis, which holds when the
build-time separation is below the cell edge:

    r_int + 2 * max_displacement_since_build  <=  cell_edge

Each grid therefore carries a static ``margin`` (cell_edge - r_int) and a
running per-grid displacement counter (incremented every drift by the
step's max per-particle |dx|_inf); the grid rebuilds — inside the jitted
step, via ``lax.cond`` — when ``2 * disp > margin``.

* SPH grids use a HARD margin: the h cap is tightened to
  ``(1 - 2*KAPPA_SPH) * subcell`` so the guarantee is exact.
* The gravity short-range grid uses the hard slack when the geometry has
  one, else a SOFT margin of ``SOFT_RCUT_FRAC * rcut``: pairs that
  staleness can lose lie in the thin shell [rcut - 2*disp, rcut] where the
  erfc truncation has already suppressed the force to a few percent of
  1/r^2 [G2: shortrange_table cutoff at RCUT = 4.5 ASMTH] — the same
  graceful-tail argument that sets RCUT itself. The in-run forcetest
  oracle measures the combined error.

Kernels consuming stale assignments MUST use per-pair minimum-image
geometry (a particle that drifted across the periodic wrap keeps its old
cell; tile-constant wrap shifts would mis-place it by a box length).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gadget_leicester_tpu.core.config import SimConfig, SimOptions
from gadget_leicester_tpu.ops.neighbors import CellList

# SPH staleness margin as a fraction of the fine-cell edge (h is capped at
# (1 - 2k) * subcell; rebuild when 2*disp > 2k * subcell... i.e. margin =
# 2k*subcell shared between the two pair ends).
KAPPA_SPH = 0.05
# gravity soft-margin floor, as a fraction of rcut (see module docstring)
SOFT_RCUT_FRAC = 0.08


@dataclass
class GridCache:
    """Cached neighbour structures + staleness bookkeeping (a SimState
    field; ``None`` for configurations that build no uniform grids)."""

    grav: Optional[CellList]           # gravity short-range grid
    sph: object                        # CellList | (CellList, CellList) | None
    grav_disp: jnp.ndarray             # f32 scalar: max-displacement sum
    sph_disp: jnp.ndarray              # since the respective build
    grav_valid: jnp.ndarray            # bool scalars
    sph_valid: jnp.ndarray
    grav_count: jnp.ndarray            # i32: alive count at grav build
    sph_count: jnp.ndarray             # i32: alive-gas count at sph build


jax.tree_util.register_dataclass(
    GridCache,
    data_fields=["grav", "sph", "grav_disp", "sph_disp",
                 "grav_valid", "sph_valid", "grav_count", "sph_count"],
    meta_fields=[],
)


# ---------------------------------------------------------------------------
# Static geometry (shared by the force pass and the cache allocator)
# ---------------------------------------------------------------------------
def resolve_gravity_mode(opts: SimOptions, n_max: int) -> str:
    """The static backend dispatch of forces.compute_forces."""
    mode = opts.gravity_mode
    if mode == "auto":
        if opts.periodic:
            mode = "treepm" if opts.pmgrid > 0 else "tree"
        else:
            mode = "direct" if n_max <= opts.direct_threshold else "tree"
    return mode


def resolve_sph_backend(opts: SimOptions, ng: int) -> str:
    backend = opts.sph_backend
    use_pallas = opts.use_pallas == "on" or (
        opts.use_pallas == "auto" and jax.default_backend() == "tpu")
    if backend == "auto":
        backend = "dense" if ng <= 4096 else (
            "blocks" if use_pallas else "cells")
    return backend


def grav_grid_geometry(cfg: SimConfig, opts: SimOptions, n_max: int):
    """(n_cells, capacity_hint, margin) for the periodic TreePM
    short-range grid. ``margin`` is the staleness budget (see module
    docstring); the occupancy tuning mirrors forces._treepm_gravity."""
    from gadget_leicester_tpu.ops.pm import ASMTH, RCUT
    box = float(cfg.box_size)
    g = opts.pmgrid
    asmth_len = ASMTH * box / g
    rcut = RCUT * asmth_len
    n_cells = max(3, int(box / rcut))
    cap_hint = opts.sr_capacity if opts.sr_capacity > 0 else 128
    while n_cells > 4 and n_max / (n_cells - 1) ** 3 <= 0.80 * cap_hint:
        n_cells -= 1
    hard = box / n_cells - rcut
    margin = max(hard, SOFT_RCUT_FRAC * rcut)
    return n_cells, cap_hint, margin


def sph_blocks_geometry(cfg: SimConfig, opts: SimOptions, ng: int):
    """(n_blocks, subcap) for the block-packed SPH path (mirrors
    forces.compute_sph)."""
    subcap = opts.sph_capacity if opts.sph_capacity > 0 else 32
    if opts.sph_grid > 0:
        n_blocks = max(2, opts.sph_grid // 2)
    else:
        n_blocks = max(2, int(round(
            (ng / (8 * 0.78 * subcap)) ** (1.0 / 3.0))))
    return n_blocks, subcap


def sph_cells_geometry(cfg: SimConfig, opts: SimOptions, ng: int):
    """(n_cells, capacity) for the coarse-cell SPH path."""
    if opts.sph_grid > 0:
        n_cells = opts.sph_grid
    else:
        use_pallas = opts.use_pallas == "on" or (
            opts.use_pallas == "auto" and jax.default_backend() == "tpu")
        if use_pallas:
            n_cells = max(3, int(round((ng / 100.0) ** (1.0 / 3.0))))
        else:
            spacing_cells = (ng ** (1.0 / 3.0)) / (
                1.6 * (3.0 * cfg.des_num_ngb / (4.0 * 3.14159)) ** (1.0 / 3.0))
            n_cells = max(3, int(spacing_cells))
    use_pallas = opts.use_pallas == "on" or (
        opts.use_pallas == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        cap = opts.sph_capacity if opts.sph_capacity > 0 else 128
        cap = max(128, ((cap + 127) // 128) * 128)
    else:
        cap = opts.sph_capacity if opts.sph_capacity > 0 else max(
            32, int(6 * ng / n_cells**3))
    return n_cells, cap


# ---------------------------------------------------------------------------
# Allocation
# ---------------------------------------------------------------------------
def _empty_cl(total_cells: int, capacity: int, n: int, n_cells, periodic,
              dtype, counts_size: int | None = None) -> CellList:
    return CellList(
        cells=jnp.full((total_cells, capacity), -1, jnp.int32),
        cell_of=jnp.full((n,), -1, jnp.int32),
        counts=jnp.zeros((counts_size if counts_size is not None
                          else total_cells,), jnp.int32),
        overflow=jnp.asarray(False),
        gslot=jnp.full((n,), -1, jnp.int32),
        origin=jnp.zeros((3,), dtype),
        inv_cell=jnp.ones((3,), dtype),
        n_cells=n_cells,
        periodic=periodic,
    )


def make_grid_cache(cfg: SimConfig, opts: SimOptions, n_max: int,
                    ng: int) -> Optional[GridCache]:
    """Allocate an (invalid) cache matching the step's static grid
    geometry; the first force pass builds in place. None when no cached
    structure applies (non-TreePM gravity and dense SPH)."""
    f = jnp.float64 if opts.dtype == "f64" else jnp.float32
    mode = resolve_gravity_mode(opts, n_max)
    backend = resolve_sph_backend(opts, ng) if ng > 1 else "none"

    grav = None
    if mode == "treepm" and not opts.nogravity:
        n_cells, cap_hint, _ = grav_grid_geometry(cfg, opts, n_max)
        use_pallas = opts.use_pallas == "on" or (
            opts.use_pallas == "auto" and jax.default_backend() == "tpu")
        if use_pallas:
            cap = max(128, ((cap_hint + 127) // 128) * 128)
        else:
            cap = opts.sr_capacity if opts.sr_capacity > 0 else max(
                64, int(8 * n_max / n_cells**3))
        grav = _empty_cl(n_cells**3, cap, n_max, n_cells, True, f)

    sph = None
    if backend == "blocks":
        n_blocks, subcap = sph_blocks_geometry(cfg, opts, ng)
        lanes = 8 * subcap
        nb_o = n_blocks if opts.periodic else n_blocks + 1
        fine = (2 * n_blocks) ** 3   # counts are per FINE subcell
        sph = (_empty_cl(n_blocks**3, lanes, ng, n_blocks, opts.periodic, f,
                         counts_size=fine),
               _empty_cl(nb_o**3, lanes, ng, nb_o, opts.periodic, f,
                         counts_size=fine))
    # (the coarse-cell SPH backend deliberately stays fresh-build: it is
    # the CPU/SPMD reference path and its max_hsml cap is unchanged)

    if grav is None and sph is None:
        return None
    return GridCache(
        grav=grav, sph=sph,
        grav_disp=jnp.zeros((), jnp.float32),
        sph_disp=jnp.zeros((), jnp.float32),
        grav_valid=jnp.asarray(False),
        sph_valid=jnp.asarray(False),
        grav_count=jnp.zeros((), jnp.int32),
        sph_count=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# In-step refresh
# ---------------------------------------------------------------------------
def note_drift(grids: Optional[GridCache], dx_max) -> Optional[GridCache]:
    """Accumulate this drift's max per-particle displacement (called by
    integrate.drift_all). ``dx_max``: traced scalar, max over alive
    particles of |dx|_inf."""
    if grids is None:
        return None
    d = jnp.asarray(dx_max, jnp.float32)
    return dataclasses.replace(
        grids, grav_disp=grids.grav_disp + d, sph_disp=grids.sph_disp + d)


def refresh(cached_cl, valid, disp, count, margin, count_now, build_fn):
    """Shared rebuild-on-demand logic: returns (cl, valid', disp', count',
    rebuilt). ``margin`` may be traced; ``build_fn()`` builds fresh
    structures (any pytree matching ``cached_cl``)."""
    need = (~valid) | (2.0 * disp > margin) | (count_now != count)
    cl = jax.lax.cond(need, lambda _: build_fn(), lambda _: cached_cl,
                      operand=None)
    return (cl,
            jnp.asarray(True),
            jnp.where(need, jnp.float32(0.0), disp),
            jnp.where(need, count_now, count),
            need)
