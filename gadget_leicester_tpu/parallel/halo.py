"""Explicit slab-domain decomposition with ppermute ghost exchange — the
hand-written SPMD path (SURVEY.md §5: "the moral equivalent of ring
attention's neighbour-passing is the ring/halo exchange of ghost particles
between adjacent shards").

The reference ships boundary particles with pairwise ``MPI_Sendrecv``
export buffers [G2: gravtree.c export/import, domain.c exchange]; here:

* particles are sharded as x-slabs over the 1-D mesh axis (the static
  analog of the PH-segment assignment);
* each shard compacts its boundary particles (within the interaction
  range of a slab face) into FIXED-capacity ghost buffers — the static
  analog of ``BufferSize`` bunching, with overflow detection;
* ``jax.lax.ppermute`` rings the buffers to the adjacent shards over ICI;
* short-range forces evaluate local targets against local+ghost sources.

This gives minimal O(surface) communication instead of GSPMD's
O(volume) all-gathers for the same computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gadget_leicester_tpu.parallel.mesh import AXIS


def compact_boundary(pos, fields, mask, capacity: int):
    """Pack rows where `mask` into a [capacity, ...] buffer (cumsum/scatter
    stream compaction). Returns (packed_fields..., count, overflow)."""
    idxpos = jnp.cumsum(mask) - 1
    put = jnp.where(mask & (idxpos < capacity), idxpos, capacity)
    outs = []
    for f in (pos,) + tuple(fields):
        buf_shape = (capacity + 1,) + f.shape[1:]
        buf = jnp.zeros(buf_shape, f.dtype).at[put].set(
            jnp.where(mask.reshape((-1,) + (1,) * (f.ndim - 1)), f, 0),
            mode="drop")
        outs.append(buf[:capacity])
    count = jnp.sum(mask)
    return outs, count, count > capacity


def make_halo_shortrange(mesh: Mesh, box: float, rcut: float, asmth: float,
                         ghost_cap: int, block: int = 256):
    """Build a shard_map'ed short-range gravity: slab-owned particles,
    ppermute ghost exchange, cutoff pair sum. Returns fn(pos, mass, soft,
    alive) -> (acc, overflow) operating on slab-sharded arrays (dim 0)."""
    n_shards = mesh.shape[AXIS]
    slab_w = box / n_shards

    from gadget_leicester_tpu.ops.gravity_direct import shortrange_trunc
    from gadget_leicester_tpu.ops.softening import grav_fac

    def local_fn(pos, mass, soft, alive):
        me = jax.lax.axis_index(AXIS)
        x0 = me * slab_w
        x1 = x0 + slab_w
        # ghost selections: particles within rcut of my left/right faces
        # (periodic slab ring)
        relx = pos[:, 0]
        near_left = alive & (relx < x0 + rcut)
        near_right = alive & (relx > x1 - rcut)
        (gl, ml, sl), cl_, ovl = compact_boundary(
            pos, (mass, soft), near_left, ghost_cap)
        (gr, mr, sr), cr_, ovr = compact_boundary(
            pos, (mass, soft), near_right, ghost_cap)
        # ring exchange: my left package -> left neighbour's right ghost
        right_perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        left_perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        ghost_from_left = [jax.lax.ppermute(x, AXIS, right_perm)
                           for x in (gr, mr, sr)]
        ghost_from_right = [jax.lax.ppermute(x, AXIS, left_perm)
                            for x in (gl, ml, sl)]

        src_pos = jnp.concatenate([pos, ghost_from_left[0],
                                   ghost_from_right[0]])
        src_mass = jnp.concatenate([jnp.where(alive, mass, 0.0),
                                    ghost_from_left[1], ghost_from_right[1]])
        src_soft = jnp.concatenate([soft, ghost_from_left[2],
                                    ghost_from_right[2]])

        # cutoff pair sum, blocked (local targets x local+ghost sources)
        n_loc = pos.shape[0]
        nb = -(-n_loc // block)
        npad = nb * block
        posp = jnp.pad(pos, ((0, npad - n_loc), (0, 0)))
        softp = jnp.pad(soft, (0, npad - n_loc))

        def one_block(i):
            tp = jax.lax.dynamic_slice(posp, (i * block, 0), (block, 3))
            ts = jax.lax.dynamic_slice(softp, (i * block,), (block,))
            dx = tp[:, None, :] - src_pos[None, :, :]
            dx = dx - box * jnp.round(dx / box)
            r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
            h = jnp.maximum(ts[:, None], src_soft[None, :])
            fac = grav_fac(r, h)
            if asmth > 0:
                fac = fac * shortrange_trunc(r, asmth)
            fac = jnp.where((r < rcut) & (r > 0), fac, 0.0)
            return -jnp.einsum("bn,bnc->bc", src_mass[None, :] * fac, dx)

        acc = jax.lax.map(one_block, jnp.arange(nb)).reshape(npad, 3)[:n_loc]
        acc = jnp.where(alive[:, None], acc, 0.0)
        return acc, (ovl | ovr).reshape(1)  # rank>=1 for sharded out_specs

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
    )

    def fn(pos, mass, soft, alive):
        acc, ovf = sharded(pos, mass, soft, alive)
        return acc, jnp.any(ovf)

    return fn


def slab_sort(pos, *fields, box: float, n_shards: int):
    """Host-order particles by owning slab (the static domain assignment;
    the rebuild of [G2: domain_exchangeParticles] is this sort + reshard).
    Returns (order, sorted arrays...)."""
    import numpy as np
    slab = np.clip((np.asarray(pos)[:, 0] / box * n_shards).astype(int),
                   0, n_shards - 1)
    order = np.argsort(slab, kind="stable")
    return (order, np.asarray(pos)[order]) + tuple(
        np.asarray(f)[order] for f in fields)
