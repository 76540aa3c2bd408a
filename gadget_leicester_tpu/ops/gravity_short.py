"""Short-range (cutoff) gravity over cell lists — the TreePM short-range
force for near-uniform regimes [G2: forcetree.c ::
force_treeevaluate_shortrange()].

The erfc-truncated force vanishes beyond Rcut ~ 4.5 Asmth, so with
cell_size >= Rcut the 27-stencil candidate set is exact. In strongly
clustered regimes the Barnes-Hut tree backend (ops.tree) takes over for
the short-range sum; this path is the fast early-time / quasi-uniform
kernel (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from functools import partial

from gadget_leicester_tpu.ops.jit_util import hybrid_jit

import jax
import jax.numpy as jnp

from gadget_leicester_tpu.ops.gravity_direct import shortrange_trunc
from gadget_leicester_tpu.ops.neighbors import CellList, apply_pairwise
from gadget_leicester_tpu.ops.softening import grav_fac


def _min_image(dx, box):
    return dx - box * jnp.round(dx / box)


@partial(hybrid_jit, static_argnames=("block", "periodic", "with_potential",
                                      "n_targets"))
def shortrange_gravity_cells(
    cl: CellList,
    pos,
    mass,
    soft,
    alive,
    asmth: float,
    rcut: float,
    box: float = 0.0,
    block: int = 256,
    periodic: bool = True,
    with_potential: bool = False,
    n_targets: int | None = None,
):
    """acc[N,3] (no G factor), erfc-truncated, zero beyond rcut.
    with_potential additionally returns the erfc-truncated softened
    potential [G2: potential.c with PMGRID]. ``n_targets``: only the
    first n rows are targets (SPMD slab prefix; ghosts source only)."""
    from gadget_leicester_tpu.ops.gravity_direct import shortrange_trunc_pot
    from gadget_leicester_tpu.ops.softening import grav_pot
    src_mass = jnp.where(alive, mass, 0.0)

    def pair_fn(idx, tp, cand):
        ts = soft[idx]
        valid = cand >= 0
        ci = jnp.maximum(cand, 0)
        sp = pos[ci]
        sm = jnp.where(valid, src_mass[ci], 0.0)
        dx = tp[:, None, :] - sp
        if periodic:
            dx = _min_image(dx, box)
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        h = jnp.maximum(ts[:, None], soft[ci])
        fac = grav_fac(r, h) * shortrange_trunc(r, asmth)
        fac = jnp.where(r < rcut, fac, 0.0)
        w = sm * fac
        acc = -jnp.einsum("bc,bcd->bd", w, dx)
        if with_potential:
            pw = grav_pot(r, h) * shortrange_trunc_pot(r, asmth)
            pw = jnp.where((r < rcut) & (r > 0), pw, 0.0)
            return (acc, jnp.sum(sm * pw, axis=-1))
        return (acc,)

    nt = pos.shape[0] if n_targets is None else n_targets
    if with_potential:
        acc, pot = apply_pairwise(cl, pos, pair_fn, block=block,
                                  n_targets=n_targets)
        return (jnp.where(alive[:nt, None], acc, 0.0),
                jnp.where(alive[:nt], pot, 0.0))
    (acc,) = apply_pairwise(cl, pos, pair_fn, block=block,
                            n_targets=n_targets)
    return jnp.where(alive[:nt, None], acc, 0.0)


def shortrange_gravity_cells_ids(
    cl: CellList,
    pos,
    mass,
    soft,
    alive,
    ids,
    asmth: float,
    rcut: float,
    box: float = 0.0,
    block: int = 256,
    periodic: bool = True,
    with_potential: bool = False,
):
    """Compacted-active variant of :func:`shortrange_gravity_cells`:
    evaluate ONLY the ``ids`` rows (-1 padded) as targets against the
    full cell list, then scatter into [N]-sized outputs (zeros
    elsewhere). Cost scales with the ACTIVE count, not the tile count —
    the per-particle economy for nearly-idle sync points
    [G2: gravtree.c evaluates the active list only]."""
    from gadget_leicester_tpu.ops.gravity_direct import shortrange_trunc_pot
    from gadget_leicester_tpu.ops.neighbors import apply_pairwise_ids
    from gadget_leicester_tpu.ops.softening import grav_pot
    src_mass = jnp.where(alive, mass, 0.0)

    def pair_fn(idx, slots, tp, cand):
        ts = soft[idx]
        valid = cand >= 0
        ci = jnp.maximum(cand, 0)
        sp = pos[ci]
        sm = jnp.where(valid, src_mass[ci], 0.0)
        dx = tp[:, None, :] - sp
        if periodic:
            dx = _min_image(dx, box)
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        h = jnp.maximum(ts[:, None], soft[ci])
        fac = grav_fac(r, h) * shortrange_trunc(r, asmth)
        fac = jnp.where(r < rcut, fac, 0.0)
        w = sm * fac
        acc = -jnp.einsum("bc,bcd->bd", w, dx)
        if with_potential:
            pw = grav_pot(r, h) * shortrange_trunc_pot(r, asmth)
            pw = jnp.where((r < rcut) & (r > 0), pw, 0.0)
            return (acc, jnp.sum(sm * pw, axis=-1))
        return (acc,)

    n = pos.shape[0]
    put = jnp.where(ids >= 0, ids, n)
    keep = (ids >= 0) & alive[jnp.maximum(ids, 0)]

    def scatter(x, width=None):
        shape = (n + 1,) + x.shape[1:]
        xm = jnp.where(keep.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0.0)
        return jnp.zeros(shape, x.dtype).at[put].set(xm, mode="drop")[:n]

    out = apply_pairwise_ids(cl, pos, ids, pair_fn, block=block)
    if with_potential:
        return scatter(out[0]), scatter(out[1])
    return scatter(out[0])
