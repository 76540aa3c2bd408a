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


@partial(hybrid_jit, static_argnames=("block", "periodic"))
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
):
    """acc[N,3] (no G factor), erfc-truncated, zero beyond rcut."""
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
        return (acc,)

    (acc,) = apply_pairwise(cl, pos, pair_fn, block=block)
    return jnp.where(alive[:, None], acc, 0.0)
