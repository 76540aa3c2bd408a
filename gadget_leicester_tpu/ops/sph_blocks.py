"""Block-packed SPH cell-pair kernels — the round-2 speed path.

The round-1 Pallas SPH kernels [ops/pallas_cells.py] size cells for tile
occupancy (~100 particles -> cell edge ~4.6 interparticle spacings), but
the SPH smoothing length is only ~2 spacings, so of each 27-cell stencil
sweep only ~1.2% of pair slots are inside the kernel support — the rest
is masked VPU work. This module shrinks the candidate volume 3.4x:

* particles are binned into FINE subcells (edge ~2.9 spacings, capacity
  ``subcap``), packed 2x2x2 into tiles of ``8 * subcap`` lanes;
* an EVEN packing (blocks at subcells {2b, 2b+1}) holds targets;
* an ODD packing (blocks at subcells {2w-1, 2w}, the grid shifted by one
  subcell) holds sources: the source region of target block b — subcells
  [2b-1, 2b+2] per axis — is EXACTLY the eight odd blocks w in {b, b+1}^3,
  so each target tile streams 8 source tiles instead of 27;
* pairwise geometry uses the per-pair minimum image (the odd packing wraps
  subcells across the box, so per-tile shifts don't exist).

Correctness requires h <= subcell edge (both ends of a pair), enforced by
the max_hsml cap exactly as the coarse path caps at the cell edge.

Rebuild of [G2: ngb.c neighbour search + density.c/hydra.c sweep loops];
the even/odd dual packing replaces the reference's tree-walk neighbour
lists with a TPU-tileable static structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gadget_leicester_tpu.ops.jit_util import hybrid_jit
from gadget_leicester_tpu.ops.neighbors import CellList


def _nb3(nb):
    """Per-axis block counts: int -> cubic; tuple passes through."""
    return (nb, nb, nb) if isinstance(nb, (int, np.integer)) else tuple(nb)


def _per3(periodic):
    """Per-axis periodicity: bool -> uniform; tuple passes through."""
    return ((periodic, periodic, periodic) if isinstance(periodic, bool)
            else tuple(periodic))


def _odd3(nb3, per3):
    """Odd-grid per-axis block counts (non-periodic axes gain a block)."""
    return tuple(n if p else n + 1 for n, p in zip(nb3, per3))


def build_block_lists(pos, mask, origin, extent, n_blocks,
                      subcap: int, periodic):
    """Bin into a (2*n_blocks)^3 fine grid; return (even, odd) CellLists
    whose ``cells`` are [B, 8*subcap] tiles (lane = subcell*subcap + rank).

    One sort serves both packings: ranks are within FINE subcells, which
    even and odd blocks merely regroup. Overflow = any fine cell > subcap.

    ``n_blocks``/``periodic`` may be per-axis tuples (anisotropic grids —
    the SPMD slab: non-periodic extended x over [x0-reach, x1+reach],
    periodic y/z over the box). The FINE CELL EDGE should be uniform
    across axes (choose extent_i = n_blocks_i * block_edge) — the
    relative-mode kernels assume one scalar shift unit.
    """
    n = pos.shape[0]
    nb3, per3 = _nb3(n_blocks), _per3(periodic)
    m3 = tuple(2 * q for q in nb3)
    origin = jnp.broadcast_to(jnp.asarray(origin, pos.dtype), (3,))
    extent = jnp.broadcast_to(jnp.asarray(extent, pos.dtype), (3,))
    inv_cell = jnp.asarray(m3, pos.dtype) / extent
    rel = (pos - origin) * inv_cell
    coords = jnp.floor(rel).astype(jnp.int32)
    m_arr = jnp.asarray(m3, jnp.int32)
    per_arr = np.asarray(per3)
    coords = jnp.where(per_arr[None, :], jnp.mod(coords, m_arr),
                       jnp.clip(coords, 0, m_arr - 1))
    cid_f = (coords[..., 0] * m3[1] + coords[..., 1]) * m3[2] \
        + coords[..., 2]
    total_f = m3[0] * m3[1] * m3[2]
    cid_sort = jnp.where(mask, cid_f, total_f)
    order = jnp.argsort(cid_sort)
    cid_sorted = cid_sort[order]
    i_arr = jnp.arange(n, dtype=jnp.int32)
    newseg = jnp.concatenate([jnp.ones((1,), bool),
                              cid_sorted[1:] != cid_sorted[:-1]])
    first = jax.lax.cummax(jnp.where(newseg, i_arr, 0))
    rank = i_arr - first
    ok = (rank < subcap) & (cid_sorted < total_f)

    c_sorted = coords[order]

    def pack(c, dims):
        """c: [N,3] fine coords (possibly shifted); returns flat block id
        and lane for each sorted particle.

        Subcell lane order is Z-SLOWEST (sub = sz*4 + sy*2 + sx): the two
        z-halves of a tile are then CONTIGUOUS 128-aligned lane slices
        (subcap 32), which lets the kernels pair each target z-half
        against only the 3 source z-planes it can reach (z-split, a 4/3
        pair-volume cut — see _make_density_block_kernel)."""
        b = c >> 1
        s = c & 1
        bid = (b[:, 0] * dims[1] + b[:, 1]) * dims[2] + b[:, 2]
        sub = (s[:, 2] * 2 + s[:, 1]) * 2 + s[:, 0]
        return bid, sub * subcap + rank

    lanes = 8 * subcap
    # even packing
    bid_e, lane_e = pack(c_sorted, nb3)
    n_e = nb3[0] * nb3[1] * nb3[2]
    cells_e = jnp.full((n_e + 1, lanes), -1, jnp.int32)
    cells_e = cells_e.at[
        jnp.where(ok, bid_e, n_e), jnp.where(ok, lane_e, 0)
    ].set(jnp.where(ok, order.astype(jnp.int32), -1), mode="drop")

    # odd packing: shift fine coords by +1 (block w holds {2w-1, 2w});
    # periodic axes wrap, non-periodic axes gain a block
    c_o = jnp.where(per_arr[None, :], jnp.mod(c_sorted + 1, m_arr),
                    c_sorted + 1)
    nbo3 = _odd3(nb3, per3)
    bid_o, lane_o = pack(c_o, nbo3)
    n_o = nbo3[0] * nbo3[1] * nbo3[2]
    cells_o = jnp.full((n_o + 1, lanes), -1, jnp.int32)
    cells_o = cells_o.at[
        jnp.where(ok, bid_o, n_o), jnp.where(ok, lane_o, 0)
    ].set(jnp.where(ok, order.astype(jnp.int32), -1), mode="drop")

    counts = jnp.zeros((total_f + 1,), jnp.int32).at[cid_sorted].add(1)
    overflow = jnp.any(counts[:total_f] > subcap)

    # preserve the scalar API in the cubic case (cache pytree stability)
    nb_meta = n_blocks if isinstance(n_blocks, (int, np.integer)) else nb3
    nbo_meta = (nbo3[0] if isinstance(n_blocks, (int, np.integer))
                else nbo3)

    def mk(cells, nb_, bid, lane):
        # inverse map for gather-merges (neighbors.merge_rows):
        # particle -> flat slot in cells.reshape(-1)
        gslot = jnp.full((n,), -1, jnp.int32).at[order].set(
            jnp.where(ok, bid * lanes + lane, -1))
        return CellList(cells=cells, cell_of=cid_f, counts=counts[:total_f],
                        overflow=overflow, origin=origin, inv_cell=inv_cell,
                        gslot=gslot, n_cells=nb_, periodic=periodic)

    return (mk(cells_e[:n_e], nb_meta, bid_e, lane_e),
            mk(cells_o[:n_o], nbo_meta, bid_o, lane_o))


def _zpad_odd(arr, nb, periodic):
    """Odd-packing arrays [Bo, rows, lanes] -> z-contiguous layout so the
    two gz-source blocks of a (gx,gy) column are ADJACENT rows (one DMA):
    z-periodic grids append a z-wrap copy; non-periodic-z odd grids are
    already z-contiguous (nbz+1 rows)."""
    nb3, per3 = _nb3(nb), _per3(periodic)
    nbo = _odd3(nb3, per3)
    if not per3[2]:
        return arr
    r, l = arr.shape[1], arr.shape[2]
    a = arr.reshape(nbo[0], nbo[1], nbo[2], r, l)
    a = jnp.concatenate([a, a[:, :, :1]], axis=2)
    return a.reshape(nbo[0] * nbo[1] * (nbo[2] + 1), r, l)


def _src_pair_base(b, g4, nb, periodic):
    """Flat base row (in the _zpad_odd layout) of the (gx,gy) column's
    two z-consecutive source blocks for even target block b."""
    nb3, per3 = _nb3(nb), _per3(periodic)
    nbo = _odd3(nb3, per3)
    bx = b // (nb3[1] * nb3[2])
    rem = b % (nb3[1] * nb3[2])
    by, bz = rem // nb3[2], rem % nb3[2]
    gx, gy = g4 >> 1, g4 & 1
    ox = (bx + gx) % nbo[0] if per3[0] else bx + gx
    oy = (by + gy) % nbo[1] if per3[1] else by + gy
    # z stride in the zpad layout: periodic z appends a wrap copy
    zdim = nbo[2] + 1 if per3[2] else nbo[2]
    return (ox * nbo[1] + oy) * zdim + bz


def _src_block_traced(b, g, nb, periodic):
    """Flat odd-block id of source g (0..7) for even target block b."""
    nb3, per3 = _nb3(nb), _per3(periodic)
    nbo = _odd3(nb3, per3)
    bx = b // (nb3[1] * nb3[2])
    rem = b % (nb3[1] * nb3[2])
    by, bz = rem // nb3[2], rem % nb3[2]
    gx, gy, gz = g >> 2, (g >> 1) & 1, g & 1
    ox = (bx + gx) % nbo[0] if per3[0] else bx + gx
    oy = (by + gy) % nbo[1] if per3[1] else by + gy
    oz = (bz + gz) % nbo[2] if per3[2] else bz + gz
    return (ox * nbo[1] + oy) * nbo[2] + oz


def _pair_geom_minimage(t, s, box, periodic, shift=None):
    """``shift``: (sx, sy, sz) traced scalars — BLOCK-RELATIVE mode
    (pack_sph_soa centers=...): dx = t_rel - s_rel + (c_even - c_odd);
    the per-pair minimum image disappears (rel coords are
    wrap-invariant, the even->odd center offset is (1-2g)*Lf)."""
    if shift is not None:
        dx = t[0, :][:, None] - s[0, :][None, :] + shift[0]
        dy = t[1, :][:, None] - s[1, :][None, :] + shift[1]
        dz = t[2, :][:, None] - s[2, :][None, :] + shift[2]
    else:
        px, py, pz = _per3(periodic)
        dx = t[0, :][:, None] - s[0, :][None, :]
        dy = t[1, :][:, None] - s[1, :][None, :]
        dz = t[2, :][:, None] - s[2, :][None, :]
        # per-axis minimum image: wrapping a NON-periodic axis is not
        # just wasted work — on a slab whose x-extent exceeds box/2 it
        # would fold a legitimately-distant pair INSIDE the kernel
        if px:
            dx = dx - box * jnp.round(dx * (1.0 / box))
        if py:
            dy = dy - box * jnp.round(dy * (1.0 / box))
        if pz:
            dz = dz - box * jnp.round(dz * (1.0 / box))
    r2 = dx * dx + dy * dy + dz * dz
    rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
    return dx, dy, dz, r2 * rinv, rinv


def block_centers(nb, parity: str, fine_edge, origin, dtype):
    """[prod(nb), 3] geometric centers of even/odd blocks (fine-cell edge
    ``fine_edge``; even block w covers fine cells {2w, 2w+1} -> center
    (2w+1)*Lf; odd block w covers {2w-1, 2w} -> center 2w*Lf). ``nb``:
    the grid's per-axis dims (pass the ODD grid's own dims for odd)."""
    nb3 = _nb3(nb)
    c_arr = jnp.arange(nb3[0] * nb3[1] * nb3[2], dtype=jnp.int32)
    cx = (c_arr // (nb3[1] * nb3[2])).astype(dtype)
    cy = ((c_arr // nb3[2]) % nb3[1]).astype(dtype)
    cz = (c_arr % nb3[2]).astype(dtype)
    xyz = jnp.stack([cx, cy, cz], -1) * 2.0
    if parity == "even":
        xyz = xyz + 1.0
    return xyz * fine_edge + origin


def _make_density_block_kernel(box, periodic, nb, lanes, dma: bool,
                               sparse: bool = False,
                               relative: bool = False,
                               fine_edge=None):
    from gadget_leicester_tpu.ops.sph_kernels import (kernel_dw_dr,
                                                      kernel_w_and_dwdh)

    # fine-cell edge (relative-mode shift unit); anisotropic grids pass
    # it explicitly (uniform across axes by construction)
    lf = fine_edge if fine_edge is not None else (
        box / (2 * nb) if isinstance(nb, (int, np.integer)) else None)

    def compute(t, ht, s, acc, shift=None):
        rho, drhodh, divv, rx, ry, rz = acc
        dx, dy, dz, r, rinv = _pair_geom_minimage(t, s, box, periodic,
                                                  shift)
        w, dwdh = kernel_w_and_dwdh(r, ht)
        dwdr = kernel_dw_dr(r, ht)
        m = s[3, :][None, :]
        fac = m * dwdr * rinv
        dvx = t[4, :][:, None] - s[4, :][None, :]
        dvy = t[5, :][:, None] - s[5, :][None, :]
        dvz = t[6, :][:, None] - s[6, :][None, :]
        vdotr = dvx * dx + dvy * dy + dvz * dz
        return (rho + jnp.sum(m * w, axis=1),
                drhodh + jnp.sum(m * dwdh, axis=1),
                divv - jnp.sum(fac * vdotr, axis=1),
                rx + jnp.sum(fac * (dvy * dz - dvz * dy), axis=1),
                ry + jnp.sum(fac * (dvz * dx - dvx * dz), axis=1),
                rz + jnp.sum(fac * (dvx * dy - dvy * dx), axis=1))

    if dma:
        # z-split (lane order is z-slowest, see build_block_lists.pack):
        # target z-halves only reach 3 of the 4 source z-planes — the low
        # half (fine z = 2b) never pairs with fine z = 2b+2 (odd block
        # b+1's high half) and vice versa, exact under the same
        # max_hsml = (1 - 2*kappa)*Lf + margin contract that sizes the
        # one-fine-cell reach of the x/y legs. 4/3 fewer pair lanes.
        # Requires 128-aligned halves (subcap multiple of 32).
        zsplit = lanes % 256 == 0
        half = lanes // 2

        def run_tile(tgt_ref, h_ref, src_hbm, out_ref, buf, sems, b):
            t = tgt_ref[0]
            ht = h_ref[0, 0, :][:, None]

            def dma_g(g4, slot):
                sid = _src_pair_base(b, g4, nb, periodic)
                return pltpu.make_async_copy(src_hbm.at[pl.ds(sid, 2)],
                                             buf.at[slot], sems.at[slot])

            dma_g(0, 0).start()

            def body(g4, acc):
                slot = jax.lax.rem(g4, 2)
                nxt = jax.lax.rem(g4 + 1, 2)

                @pl.when(g4 + 1 < 4)
                def _():
                    dma_g(g4 + 1, nxt).start()

                dma_g(g4, slot).wait()
                if relative:
                    shx = (1 - 2 * (g4 >> 1)).astype(jnp.float32) * lf
                    shy = (1 - 2 * (g4 & 1)).astype(jnp.float32) * lf
                    sh0, sh1 = (shx, shy, lf), (shx, shy, -lf)
                else:
                    sh0 = sh1 = None
                s0, s1 = buf[slot, 0], buf[slot, 1]
                if not zsplit:
                    acc = compute(t, ht, s0, acc, shift=sh0)
                    return compute(t, ht, s1, acc, shift=sh1)
                lo, hi = acc[:6], acc[6:]
                t_lo, t_hi = t[:, :half], t[:, half:]
                lo = compute(t_lo, ht[:half], s0, lo, shift=sh0)
                lo = compute(t_lo, ht[:half], s1[:, :half], lo, shift=sh1)
                hi = compute(t_hi, ht[half:], s0[:, half:], hi, shift=sh0)
                hi = compute(t_hi, ht[half:], s1, hi, shift=sh1)
                return lo + hi

            if zsplit:
                z = jnp.zeros((half,), jnp.float32)
                acc = jax.lax.fori_loop(0, 4, body, (z,) * 12)
                for r in range(6):
                    out_ref[0, r, :half] = acc[r]
                    out_ref[0, r, half:] = acc[6 + r]
            else:
                z = jnp.zeros((lanes,), jnp.float32)
                rho, drhodh, divv, rx, ry, rz = jax.lax.fori_loop(
                    0, 4, body, (z, z, z, z, z, z))
                out_ref[0, 0, :] = rho
                out_ref[0, 1, :] = drhodh
                out_ref[0, 2, :] = divv
                out_ref[0, 3, :] = rx
                out_ref[0, 4, :] = ry
                out_ref[0, 5, :] = rz

        def kernel(flag_ref, tgt_ref, h_ref, src_hbm, out_ref, buf, sems):
            # activity gate: no active gas target in this block -> skip.
            # flag_ref: scalar-prefetch [B] int32 in SMEM. In sparse mode
            # it instead holds COMPACTED real block ids (-1 = padding) and
            # the grid runs over the compacted list.
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

            if sparse:
                @pl.when(flag_ref[pl.program_id(0)] >= 0)
                def _gated():
                    run_tile(tgt_ref, h_ref, src_hbm, out_ref, buf, sems,
                             flag_ref[pl.program_id(0)])
            else:
                @pl.when(flag_ref[pl.program_id(0)] > 0)
                def _gated():
                    run_tile(tgt_ref, h_ref, src_hbm, out_ref, buf, sems,
                             pl.program_id(0))

        return kernel

    def kernel_grid(flag_ref, tgt_ref, src_ref, h_ref, out_ref):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(flag_ref[pl.program_id(0)] > 0)
        def _gated():
            t = tgt_ref[0]
            ht = h_ref[0, 0, :][:, None]
            acc = (out_ref[0, 0, :], out_ref[0, 1, :], out_ref[0, 2, :],
                   out_ref[0, 3, :], out_ref[0, 4, :], out_ref[0, 5, :])
            shift = None
            if relative:
                shift = ((1 - 2 * (g >> 2)).astype(jnp.float32) * lf,
                         (1 - 2 * ((g >> 1) & 1)).astype(jnp.float32) * lf,
                         (1 - 2 * (g & 1)).astype(jnp.float32) * lf)
            rho, drhodh, divv, rx, ry, rz = compute(t, ht, src_ref[0], acc,
                                                    shift=shift)
            out_ref[0, 0, :] = rho
            out_ref[0, 1, :] = drhodh
            out_ref[0, 2, :] = divv
            out_ref[0, 3, :] = rx
            out_ref[0, 4, :] = ry
            out_ref[0, 5, :] = rz

    return kernel_grid


def _src_index_fn(nb, periodic):
    def src_index(bi, g):
        return (_src_block_traced(bi, g, nb, periodic), 0, 0)
    return src_index


def density_sums_blocks(cl_e: CellList, soa_e, soa_o, h_slots, box: float,
                        interpret: bool = False, flags=None,
                        relative: bool = False, fine_edge=None):
    """Density sweep on block tiles. soa_e/soa_o: [B,8,lanes]/[Bo,8,lanes]
    from pack_sph_soa on the even/odd lists; h_slots [B, lanes]. Returns
    [B, 8, lanes] rows (rho, drhodh, divv, rot xyz). ``flags`` [B,1] int32
    gates tiles (DMA path only; None = all on). ``relative``: soas hold
    block-relative coords (pack_sph_soa centers=...); anisotropic grids
    must pass the static ``fine_edge``."""
    b, _, lanes = soa_e.shape
    nb = cl_e.n_cells
    periodic = cl_e.periodic
    if flags is None:
        flags = jnp.ones((b,), jnp.int32)
    if interpret:
        src_ix = _src_index_fn(nb, periodic)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, 8),
            in_specs=[
                pl.BlockSpec((1, 8, lanes), lambda bi, g, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 8, lanes), lambda bi, g, *_: src_ix(bi, g)),
                pl.BlockSpec((1, 1, lanes), lambda bi, g, *_: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, lanes),
                                   lambda bi, g, *_: (bi, 0, 0)),
        )
        return pl.pallas_call(
            _make_density_block_kernel(float(box), periodic, nb, lanes,
                                       dma=False, relative=relative,
                                       fine_edge=fine_edge),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, 8, lanes), soa_e.dtype),
            interpret=True,
        )(flags, soa_e, soa_o, h_slots.reshape(b, 1, lanes))
    return pl.pallas_call(
        _make_density_block_kernel(float(box), periodic, nb, lanes, dma=True,
                                   relative=relative, fine_edge=fine_edge),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, lanes), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 8, lanes), soa_e.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, lanes), soa_e.dtype),
        # large-subcap tiles exceed the 16M scoped-VMEM default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(flags, soa_e, h_slots.reshape(b, 1, lanes),
      _zpad_odd(soa_o, nb, periodic))


def _make_hydro_block_kernel(box, periodic, nb, lanes, visc_const,
                             dma: bool, sparse: bool = False,
                             relative: bool = False,
                             fine_edge=None):
    from gadget_leicester_tpu.ops.sph_kernels import kernel_dw_dr

    # fine-cell edge (relative-mode shift unit); see the density kernel
    lf = fine_edge if fine_edge is not None else (
        box / (2 * nb) if isinstance(nb, (int, np.integer)) else None)

    def compute(params, ta, tb, s16, acc, shift=None):
        # s16 rows: 0-7 = soa_a (x,y,z,m,vx,vy,vz,h);
        #           8-12 = soa_b (rho, p_over_rho2*f, c+..., balsara, valid)
        hubble_a2_flow, fac_mu = params
        ax_a, ay_a, az_a, dte, msv_a = acc
        sa = s16[:8]
        dx, dy, dz, r, rinv = _pair_geom_minimage(ta, sa, box, periodic,
                                                  shift)
        ht = ta[7, :][:, None]
        hs = sa[7, :][None, :]
        if shift is not None:
            # BLOCK-RELATIVE mode: the self-pair (every particle is in
            # both the even and the odd list) has dx = (p-c_e)-(p-c_o)
            # +(c_e-c_o) = 0 only up to fp rounding — r ~ ulp slips the
            # r>0 gate and mu = vdotr/r is garbage. Exclude by particle
            # id (row 13 / tb[5]; float32-exact below 2^24 particles).
            inside = (r < jnp.maximum(ht, hs)) & \
                (tb[5, :][:, None] != s16[13, :][None, :])
        else:
            inside = (r < jnp.maximum(ht, hs)) & (r > 0.0)
        inside = inside & (s16[12, :][None, :] > 0.0)
        dwk_i = kernel_dw_dr(r, ht)
        dwk_j = kernel_dw_dr(r, hs)
        dvx = ta[4, :][:, None] - sa[4, :][None, :]
        dvy = ta[5, :][:, None] - sa[5, :][None, :]
        dvz = ta[6, :][:, None] - sa[6, :][None, :]
        r2 = r * r
        vdotr2 = dvx * dx + dvy * dy + dvz * dz + hubble_a2_flow * r2
        approaching = vdotr2 < 0.0
        mu_ij = fac_mu * vdotr2 * rinv
        vsig = tb[2, :][:, None] + s16[10, :][None, :] \
            - 3.0 * jnp.where(approaching, mu_ij, 0.0)
        rho_ij = 0.5 * (tb[0, :][:, None] + s16[8, :][None, :])
        rs = jax.lax.rsqrt(jnp.maximum(rho_ij, 1e-37))
        rho_ij_inv = rs * rs
        f_ij = 0.5 * (tb[3, :][:, None] + s16[11, :][None, :])
        # 0.5 * visc_const * f_ij with f_ij = (f1+f2)/2 == the reference's
        # 0.25 * ArtBulkViscConst * (f1+f2) [G2: hydra.c, Springel05 eq.14]
        visc = jnp.where(approaching,
                         0.5 * visc_const * vsig * (-mu_ij)
                         * rho_ij_inv * f_ij, 0.0)
        m = sa[3, :][None, :]
        hfc_visc = 0.5 * m * visc * (dwk_i + dwk_j) * rinv
        hfc = hfc_visc + m * (tb[1, :][:, None] * dwk_i
                              + s16[9, :][None, :] * dwk_j) * rinv
        mask = jnp.where(inside, 1.0, 0.0)
        hfc = hfc * mask
        hfc_visc = hfc_visc * mask
        msv = jnp.max(jnp.where(inside, vsig, 0.0), axis=1)
        return (ax_a - jnp.sum(hfc * dx, axis=1),
                ay_a - jnp.sum(hfc * dy, axis=1),
                az_a - jnp.sum(hfc * dz, axis=1),
                dte + 0.5 * jnp.sum(hfc_visc * vdotr2, axis=1),
                jnp.maximum(msv_a, msv))

    if dma:
        # z-split — see _make_density_block_kernel (same contract)
        zsplit = lanes % 256 == 0
        half = lanes // 2

        def run_tile(params_ref, tgt_a, tgt_b, src_hbm, out_ref, buf, sems,
                     b):
            params = (params_ref[0, 0], params_ref[0, 1])
            ta, tb = tgt_a[0], tgt_b[0]

            def dma_g(g4, slot):
                sid = _src_pair_base(b, g4, nb, periodic)
                return pltpu.make_async_copy(src_hbm.at[pl.ds(sid, 2)],
                                             buf.at[slot], sems.at[slot])

            dma_g(0, 0).start()

            def body(g4, acc):
                slot = jax.lax.rem(g4, 2)
                nxt = jax.lax.rem(g4 + 1, 2)

                @pl.when(g4 + 1 < 4)
                def _():
                    dma_g(g4 + 1, nxt).start()

                dma_g(g4, slot).wait()
                if relative:
                    shx = (1 - 2 * (g4 >> 1)).astype(jnp.float32) * lf
                    shy = (1 - 2 * (g4 & 1)).astype(jnp.float32) * lf
                    sh0, sh1 = (shx, shy, lf), (shx, shy, -lf)
                else:
                    sh0 = sh1 = None
                s0, s1 = buf[slot, 0], buf[slot, 1]
                if not zsplit:
                    acc = compute(params, ta, tb, s0, acc, shift=sh0)
                    return compute(params, ta, tb, s1, acc, shift=sh1)
                lo, hi = acc[:5], acc[5:]
                ta_lo, ta_hi = ta[:, :half], ta[:, half:]
                tb_lo, tb_hi = tb[:, :half], tb[:, half:]
                lo = compute(params, ta_lo, tb_lo, s0, lo, shift=sh0)
                lo = compute(params, ta_lo, tb_lo, s1[:, :half], lo,
                             shift=sh1)
                hi = compute(params, ta_hi, tb_hi, s0[:, half:], hi,
                             shift=sh0)
                hi = compute(params, ta_hi, tb_hi, s1, hi, shift=sh1)
                return lo + hi

            if zsplit:
                z = jnp.zeros((half,), jnp.float32)
                acc = jax.lax.fori_loop(0, 4, body, (z,) * 10)
                for r in range(5):
                    out_ref[0, r, :half] = acc[r]
                    out_ref[0, r, half:] = acc[5 + r]
            else:
                z = jnp.zeros((lanes,), jnp.float32)
                ax, ay, az, dte, msv = jax.lax.fori_loop(
                    0, 4, body, (z, z, z, z, z))
                out_ref[0, 0, :] = ax
                out_ref[0, 1, :] = ay
                out_ref[0, 2, :] = az
                out_ref[0, 3, :] = dte
                out_ref[0, 4, :] = msv

        def kernel(flag_ref, params_ref, tgt_a, tgt_b, src_hbm, out_ref,
                   buf, sems):
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

            if sparse:
                @pl.when(flag_ref[pl.program_id(0)] >= 0)
                def _gated():
                    run_tile(params_ref, tgt_a, tgt_b, src_hbm, out_ref,
                             buf, sems, flag_ref[pl.program_id(0)])
            else:
                @pl.when(flag_ref[pl.program_id(0)] > 0)
                def _gated():
                    run_tile(params_ref, tgt_a, tgt_b, src_hbm, out_ref,
                             buf, sems, pl.program_id(0))

        return kernel

    def kernel_grid(flag_ref, params_ref, tgt_a, tgt_b, src_ref, out_ref):
        params = (params_ref[0, 0], params_ref[0, 1])
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(flag_ref[pl.program_id(0)] > 0)
        def _gated():
            acc = (out_ref[0, 0, :], out_ref[0, 1, :], out_ref[0, 2, :],
                   out_ref[0, 3, :], out_ref[0, 4, :])
            shift = None
            if relative:
                shift = ((1 - 2 * (g >> 2)).astype(jnp.float32) * lf,
                         (1 - 2 * ((g >> 1) & 1)).astype(jnp.float32) * lf,
                         (1 - 2 * (g & 1)).astype(jnp.float32) * lf)
            ax, ay, az, dte, msv = compute(params, tgt_a[0], tgt_b[0],
                                           src_ref[0], acc, shift=shift)
            out_ref[0, 0, :] = ax
            out_ref[0, 1, :] = ay
            out_ref[0, 2, :] = az
            out_ref[0, 3, :] = dte
            out_ref[0, 4, :] = msv

    return kernel_grid


def hydro_sums_blocks(cl_e: CellList, soa_a, soa_b, src16, box: float,
                      visc_const: float, hubble_a2_flow, fac_mu,
                      interpret: bool = False, flags=None,
                      relative: bool = False, fine_edge=None):
    """Hydro sweep on block tiles. soa_a/soa_b: even [B,8,lanes];
    src16: odd [Bo,16,lanes] (rows 0-7 = a, 8-12 = b). Output rows:
    ax, ay, az, dt_ent_raw, max_signal_vel. ``flags`` [B,1] gates tiles
    (DMA path only)."""
    b, _, lanes = soa_a.shape
    nb = cl_e.n_cells
    periodic = cl_e.periodic
    params = jnp.stack([jnp.asarray(hubble_a2_flow, soa_a.dtype),
                        jnp.asarray(fac_mu, soa_a.dtype)]).reshape(1, 2)
    if flags is None:
        flags = jnp.ones((b,), jnp.int32)
    if interpret:
        src_ix = _src_index_fn(nb, periodic)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, 8),
            in_specs=[
                pl.BlockSpec((1, 2), lambda bi, g, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, lanes), lambda bi, g, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 8, lanes), lambda bi, g, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 16, lanes),
                             lambda bi, g, *_: src_ix(bi, g)),
            ],
            out_specs=pl.BlockSpec((1, 8, lanes),
                                   lambda bi, g, *_: (bi, 0, 0)),
        )
        return pl.pallas_call(
            _make_hydro_block_kernel(float(box), periodic, nb, lanes,
                                     float(visc_const), dma=False,
                                     relative=relative,
                                     fine_edge=fine_edge),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, 8, lanes), soa_a.dtype),
            interpret=True,
        )(flags, params, soa_a, soa_b, src16)
    return pl.pallas_call(
        _make_hydro_block_kernel(float(box), periodic, nb, lanes,
                                 float(visc_const), dma=True,
                                 relative=relative, fine_edge=fine_edge),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda bi, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 16, lanes), soa_a.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, 8, lanes), soa_a.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(flags, params, soa_a, soa_b, _zpad_odd(src16, nb, periodic))


def density_adaptive_blocks(
    pos, vel, mass, hsml0, gas_mask,
    des_num_ngb: float, max_dev: float,
    box: float, n_blocks=None, subcap: int = 32,
    min_hsml: float = 0.0, max_hsml=None,
    periodic=True, max_iters: int = 40,
    origin=0.0, extent=None, interpret: bool = False,
    active=None, cls=None, fine_edge=None,
):
    """Adaptive-h density on the block kernels (API mirrors
    pallas_cells.density_adaptive_pallas; returns (DensityResult,
    (cl_even, cl_odd)) — the pair is reused by hydro_force_blocks).

    ``active`` (per-particle bool, None = all): only active targets are
    solved; tiles with no active target skip their sweeps entirely and
    return zeros there — the caller keeps drift-predicted fields for
    inactive particles [G2: density.c computes only the active list].
    With ``active``, the SoA packs are also gated to active tiles and
    their odd-source blocks.

    ``cls``: optional prebuilt (possibly stale within the models.grids
    displacement margin — pair geometry is per-pair minimum-image)
    (cl_even, cl_odd) pair; skips the sort."""
    from gadget_leicester_tpu.ops.pallas_cells import pack_sph_soa
    from gadget_leicester_tpu.ops.sph_dense import (DensityResult,
                                                    density_adaptive_generic)

    if cls is None:
        extent = box if extent is None else extent
        cl_e, cl_o = build_block_lists(pos, gas_mask, origin, extent,
                                       n_blocks=n_blocks, subcap=subcap,
                                       periodic=periodic)
    else:
        cl_e, cl_o = cls
    ng = pos.shape[0]
    b, lanes = cl_e.cells.shape

    with jax.named_scope("density_pack"):
        if active is not None:
            from gadget_leicester_tpu.ops.pallas_cells import \
                cell_activity_flags
            flags = cell_activity_flags(cl_e, active & gas_mask)
        else:
            flags = None

        ones = jnp.ones(ng, pos.dtype)
        # BLOCK-RELATIVE coords whenever the fine edge is STATIC: kernels
        # apply constant (1-2g)*Lf stencil shifts instead of per-pair
        # minimum image (exact for in-margin stale assignments — rel
        # coords are wrap-invariant; see _pair_geom_minimage). Static-
        # edge grids: fully-periodic cubic (lf = box/2nb) and anisotropic
        # grids whose caller passes ``fine_edge`` (the SPMD slab).
        # Dynamic-extent vacuum grids (extent traced from the particle
        # cloud) stay in per-pair-minimum-image mode.
        rel_on = (periodic is True) or (fine_edge is not None)
        if rel_on:
            lf = fine_edge if fine_edge is not None \
                else box / (2 * cl_e.n_cells)
            # wrap only matters on periodic axes; rel magnitudes are
            # bounded by the subcell + staleness drift elsewhere, so a
            # scalar box min-image is a no-op there
            ctr_e = block_centers(cl_e.n_cells, "even", lf, cl_e.origin,
                                  pos.dtype)
            ctr_o = block_centers(cl_o.n_cells, "odd", lf, cl_o.origin,
                                  pos.dtype)
            soa_e = pack_sph_soa(cl_e, pos, vel, mass, ones, gas_mask,
                                 centers=ctr_e, wrap=box)
            soa_o = pack_sph_soa(cl_o, pos, vel, mass, ones, gas_mask,
                                 centers=ctr_o, wrap=box)
        else:
            soa_e = pack_sph_soa(cl_e, pos, vel, mass, ones, gas_mask)
            soa_o = pack_sph_soa(cl_o, pos, vel, mass, ones, gas_mask)
        idx = jnp.maximum(cl_e.cells, 0)
        valid = (cl_e.cells >= 0) & gas_mask[idx]
        if active is not None:
            valid = valid & active[idx]
        mass_slots = soa_e[:, 3, :].reshape(-1)
        mask_slots = valid.reshape(-1)
        h0_slots = jnp.where(valid, hsml0[idx], 1.0).reshape(-1)

    def sweep(h_slots, undone=None):
        fl = flags
        if undone is not None:
            # later Newton sweeps touch only tiles that still hold an
            # unconverged target (undone already excludes inactive slots)
            fl = jnp.any(undone.reshape(b, lanes), axis=1).astype(jnp.int32)
        out = density_sums_blocks(cl_e, soa_e, soa_o,
                                  h_slots.reshape(b, lanes), box,
                                  interpret=interpret, flags=fl,
                                  relative=rel_on, fine_edge=fine_edge)
        rho = out[:, 0, :].reshape(-1)
        drhodh = out[:, 1, :].reshape(-1)
        divv = out[:, 2, :].reshape(-1)
        rot = jnp.stack([out[:, 3, :].reshape(-1), out[:, 4, :].reshape(-1),
                         out[:, 5, :].reshape(-1)], axis=-1)
        return rho, drhodh, divv, rot

    res_slots = density_adaptive_generic(
        sweep, mass_slots, h0_slots, mask_slots, des_num_ngb, max_dev,
        min_hsml=min_hsml, max_hsml=max_hsml, max_iters=max_iters)

    with jax.named_scope("density_merge"):
        # ONE row gather over the inverse slot map (see neighbors.gslot)
        # instead of six per-field scatters. Slots of inactive targets
        # carry the masked values (rho 0, dhsml 1), matching the old
        # scatter fills; dropped/dead particles hit the fill sentinel row.
        slots_mat = jnp.stack(
            [res_slots.rho, res_slots.dhsml_factor, res_slots.div_vel,
             res_slots.curl_vel, res_slots.num_ngb_eff,
             res_slots.hsml], axis=-1)
        fills = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0, 1.0], slots_mat.dtype)
        slots_mat = jnp.concatenate([slots_mat, fills[None, :]], axis=0)
        gidx = jnp.where(cl_e.gslot >= 0, cl_e.gslot, b * lanes)
        vals = jnp.take(slots_mat, gidx, axis=0)
        res = DensityResult(
            rho=vals[:, 0],
            dhsml_factor=vals[:, 1],
            div_vel=vals[:, 2],
            curl_vel=vals[:, 3],
            num_ngb_eff=vals[:, 4],
            hsml=vals[:, 5],
            iters=res_slots.iters,
        )
    return res, (cl_e, cl_o)


def hydro_force_blocks(
    cls, pos, vel, mass, hsml, rho, pressure, dhsml_factor,
    div_vel, curl_vel, gas_mask, visc_const: float, box: float,
    hubble_a2_flow=0.0, hubble_a2_norm=1.0, fac_mu=1.0,
    interpret: bool = False, active=None, fine_edge=None,
):
    """Entropy-form hydro force on block tiles; cls = (cl_even, cl_odd)
    from density_adaptive_blocks. [G2: hydra.c :: hydro_evaluate()]"""
    from gadget_leicester_tpu.core.config import GAMMA, GAMMA_MINUS1
    from gadget_leicester_tpu.ops.sph_dense import HydroResult

    cl_e, cl_o = cls
    ng = pos.shape[0]
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    c_snd = jnp.sqrt(GAMMA * pressure / rho_safe)
    p_over_rho2 = pressure / rho_safe**2 * dhsml_factor
    h_safe = jnp.where(hsml > 0, hsml, 1.0)
    balsara = jnp.abs(div_vel) / (
        jnp.abs(div_vel) + curl_vel + 1e-4 * c_snd / h_safe / fac_mu)

    with jax.named_scope("hydro_pack"):
        if active is not None:
            from gadget_leicester_tpu.ops.pallas_cells import \
                cell_activity_flags
            flags = cell_activity_flags(cl_e, active & gas_mask)
        else:
            flags = None

        # ONE [N,16] row gather per list (cf. pack_cells_soa): the a-rows
        # (x,y,z,m,vx,vy,vz,h) and b-rows (rho, p/rho^2*f, c_snd,
        # balsara, valid) arrive in a single gather instead of an 8-row
        # pack + 4 scalar gathers + concat per list
        zero = jnp.zeros_like(mass)
        # row 13 = particle id (float32-exact < 2^24): the relative-mode
        # kernel's exact self-pair exclusion (see _make_hydro_block_kernel)
        pid = jnp.arange(pos.shape[0], dtype=pos.dtype)
        table16 = jnp.stack(
            [pos[:, 0], pos[:, 1], pos[:, 2], mass,
             vel[:, 0], vel[:, 1], vel[:, 2], hsml,
             rho, p_over_rho2, c_snd, balsara,
             jnp.ones_like(mass), pid, zero, zero], axis=1)
        far = jnp.asarray(-7.0, pos.dtype) / cl_e.inv_cell[0]
        park16 = (jnp.zeros((16,), pos.dtype).at[:3].set(far)
                  .at[7].set(1.0).at[13].set(-1.0))

        # block-relative coords whenever the fine edge is static (must
        # match the density packs — see density_adaptive_blocks)
        rel_on = (cl_e.periodic is True) or (fine_edge is not None)

        def pack16(cl, centers=None):
            idx = jnp.maximum(cl.cells, 0)
            valid = (cl.cells >= 0) & gas_mask[idx]
            rows = table16[idx]                       # [B, lanes, 16]
            if centers is not None:
                rel = rows[:, :, :3] - centers[:, None, :]
                rel = rel - box * jnp.round(rel * (1.0 / box))
                rows = jnp.concatenate([rel, rows[:, :, 3:]], axis=-1)
            rows = jnp.where(valid[:, :, None], rows,
                             park16[None, None, :])
            return rows.transpose(0, 2, 1)            # [B, 16, lanes]

        if rel_on:
            lf_h = fine_edge if fine_edge is not None \
                else box / (2 * cl_e.n_cells)
            rows_e = pack16(cl_e, block_centers(cl_e.n_cells, "even", lf_h,
                                                cl_e.origin, pos.dtype))
            src16 = pack16(cl_o, block_centers(cl_o.n_cells, "odd", lf_h,
                                               cl_o.origin, pos.dtype))
        else:
            rows_e = pack16(cl_e)
            src16 = pack16(cl_o)
        soa_a = rows_e[:, :8]
        soa_b = rows_e[:, 8:]

    out = hydro_sums_blocks(cl_e, soa_a, soa_b, src16, box, visc_const,
                            hubble_a2_flow, fac_mu, interpret=interpret,
                            flags=flags, relative=rel_on,
                            fine_edge=fine_edge)
    with jax.named_scope("hydro_merge"):
        from gadget_leicester_tpu.ops.neighbors import merge_rows
        res5 = merge_rows(out, cl_e, 5, ng)
        acc = res5[:, :3]
        dt_raw = res5[:, 3]
        msv = res5[:, 4]
    dt_ent = dt_raw * GAMMA_MINUS1 / (
        jnp.asarray(hubble_a2_norm, rho.dtype) * rho_safe**GAMMA_MINUS1)
    gm = gas_mask
    return HydroResult(
        acc=jnp.where(gm[:, None], acc, 0.0),
        dt_entropy=jnp.where(gm, dt_ent, 0.0),
        max_signal_vel=jnp.where(gm, msv, 0.0),
    )


# ---------------------------------------------------------------------------
# Cell-compacted active-ENTRY variants (docs/compact_active_design.md):
# per-particle granularity for nearly-idle sync points. Activity is SPREAD
# (measured: 93% of blocks hold an active at 0.68% active), so block
# gating floors at ~1x; entries compact the <= ENTRY_LANES active targets
# of each block into one kernel step whose 8 odd source blocks arrive as
# ONE strided DMA from a fully padded layout.
# [G2: density.c / hydra.c — only the active list gets fresh sums]
# ---------------------------------------------------------------------------


def count_block_entries(cl_e: CellList, active, lanes_grp: int):
    """Entries the active-entry SPH kernels would need: per even block,
    ceil(n_active/lanes_grp), summed. O(N + B) via the fine cell_of (an
    upper bound when fine cells overflowed subcap — conservative).

    Cubic grids only (the single-chip production path); the anisotropic
    SPMD slab uses block-level activity flags instead."""
    assert isinstance(cl_e.n_cells, (int, np.integer)), \
        "entries tier requires a cubic block grid"
    nb = cl_e.n_cells
    m = 2 * nb
    cid = cl_e.cell_of
    cx = cid // (m * m)
    rem = cid % (m * m)
    cy, cz = rem // m, rem % m
    bid = ((cx >> 1) * nb + (cy >> 1)) * nb + (cz >> 1)
    b3 = nb ** 3
    dst = jnp.where(active, bid, b3)
    counts = jnp.zeros((b3 + 1,), jnp.int32).at[dst].add(
        1, mode="drop")[:b3]
    return jnp.sum((counts + lanes_grp - 1) // lanes_grp)


def _xyzpad_odd_full(arr, nb: int, periodic: bool):
    """Odd-packing soa [Bo, R, lanes] -> [(nb+1), (nb+1), (nb+1), R,
    lanes]: the 8 odd source blocks of even target b are the contiguous
    [bx:bx+2, by:by+2, bz:bz+2] corner — ONE strided DMA. Periodic grids
    get wrap copies appended on every axis; non-periodic odd grids are
    (nb+1)^3 already."""
    r, l = arr.shape[1], arr.shape[2]
    if not periodic:
        return arr.reshape(nb + 1, nb + 1, nb + 1, r, l)
    a = arr.reshape(nb, nb, nb, r, l)
    a = jnp.concatenate([a, a[:, :, :1]], axis=2)
    a = jnp.concatenate([a, a[:, :1]], axis=1)
    return jnp.concatenate([a, a[:1]], axis=0)


def _make_sph_entries_kernel(box, periodic, nb, lanes, L, kind,
                             visc_const=0.0):
    """SPH kernel over compacted active entries (see the gravity analog
    pallas_cells._make_kernel_entries). kind: 'density' | 'hydro'."""
    from gadget_leicester_tpu.ops.sph_kernels import (kernel_dw_dr,
                                                      kernel_w_and_dwdh)

    def dma_for(eblk_ref, src_hbm, buf, sems, e, slot):
        b = jnp.maximum(eblk_ref[e], 0)
        bx = b // (nb * nb)
        rem = b % (nb * nb)
        by, bz = rem // nb, rem % nb
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(bx, 2), pl.ds(by, 2), pl.ds(bz, 2)],
            buf.at[slot], sems.at[slot])

    def density_compute(t, ht, s, acc):
        rho, drhodh, divv, rx, ry, rz = acc
        dx = t[0, :L][:, None] - s[0, :][None, :]
        dy = t[1, :L][:, None] - s[1, :][None, :]
        dz = t[2, :L][:, None] - s[2, :][None, :]
        if periodic:
            dx = dx - box * jnp.round(dx * (1.0 / box))
            dy = dy - box * jnp.round(dy * (1.0 / box))
            dz = dz - box * jnp.round(dz * (1.0 / box))
        r2 = dx * dx + dy * dy + dz * dz
        rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
        r = r2 * rinv
        w, dwdh = kernel_w_and_dwdh(r, ht)
        dwdr = kernel_dw_dr(r, ht)
        m = s[3, :][None, :]
        fac = m * dwdr * rinv
        dvx = t[4, :L][:, None] - s[4, :][None, :]
        dvy = t[5, :L][:, None] - s[5, :][None, :]
        dvz = t[6, :L][:, None] - s[6, :][None, :]
        vdotr = dvx * dx + dvy * dy + dvz * dz
        return (rho + jnp.sum(m * w, axis=1),
                drhodh + jnp.sum(m * dwdh, axis=1),
                divv - jnp.sum(fac * vdotr, axis=1),
                rx + jnp.sum(fac * (dvy * dz - dvz * dy), axis=1),
                ry + jnp.sum(fac * (dvz * dx - dvx * dz), axis=1),
                rz + jnp.sum(fac * (dvx * dy - dvy * dx), axis=1))

    def hydro_compute(params, t, s16, acc):
        hubble_a2_flow, fac_mu = params
        ax_a, ay_a, az_a, dte, msv_a = acc
        sa = s16[:8]
        dx = t[0, :L][:, None] - sa[0, :][None, :]
        dy = t[1, :L][:, None] - sa[1, :][None, :]
        dz = t[2, :L][:, None] - sa[2, :][None, :]
        if periodic:
            dx = dx - box * jnp.round(dx * (1.0 / box))
            dy = dy - box * jnp.round(dy * (1.0 / box))
            dz = dz - box * jnp.round(dz * (1.0 / box))
        r2 = dx * dx + dy * dy + dz * dz
        rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
        r = r2 * rinv
        ht = t[7, :L][:, None]
        hs = sa[7, :][None, :]
        inside = (r < jnp.maximum(ht, hs)) & (r > 0.0)
        inside = inside & (s16[12, :][None, :] > 0.0)
        dwk_i = kernel_dw_dr(r, ht)
        dwk_j = kernel_dw_dr(r, hs)
        dvx = t[4, :L][:, None] - sa[4, :][None, :]
        dvy = t[5, :L][:, None] - sa[5, :][None, :]
        dvz = t[6, :L][:, None] - sa[6, :][None, :]
        vdotr2 = dvx * dx + dvy * dy + dvz * dz + hubble_a2_flow * r2
        approaching = vdotr2 < 0.0
        mu_ij = fac_mu * vdotr2 * rinv
        vsig = t[10, :L][:, None] + s16[10, :][None, :] \
            - 3.0 * jnp.where(approaching, mu_ij, 0.0)
        rho_ij = 0.5 * (t[8, :L][:, None] + s16[8, :][None, :])
        rs = jax.lax.rsqrt(jnp.maximum(rho_ij, 1e-37))
        rho_ij_inv = rs * rs
        f_ij = 0.5 * (t[11, :L][:, None] + s16[11, :][None, :])
        visc = jnp.where(approaching,
                         0.5 * visc_const * vsig * (-mu_ij)
                         * rho_ij_inv * f_ij, 0.0)
        m = sa[3, :][None, :]
        hfc_visc = 0.5 * m * visc * (dwk_i + dwk_j) * rinv
        hfc = hfc_visc + m * (t[9, :L][:, None] * dwk_i
                              + s16[9, :][None, :] * dwk_j) * rinv
        mask = jnp.where(inside, 1.0, 0.0)
        hfc = hfc * mask
        hfc_visc = hfc_visc * mask
        msv = jnp.max(jnp.where(inside, vsig, 0.0), axis=1)
        return (ax_a - jnp.sum(hfc * dx, axis=1),
                ay_a - jnp.sum(hfc * dy, axis=1),
                az_a - jnp.sum(hfc * dz, axis=1),
                dte + 0.5 * jnp.sum(hfc_visc * vdotr2, axis=1),
                jnp.maximum(msv_a, msv))

    def kernel(eblk_ref, *refs):
        from gadget_leicester_tpu.ops.pallas_cells import ENTRIES_PER_BLOCK
        E = ENTRIES_PER_BLOCK
        if kind == "hydro":
            params_ref, tgt_ref, src_hbm, out_ref, buf, sems = refs
        else:
            tgt_ref, h_ref, src_hbm, out_ref, buf, sems = refs
        i = pl.program_id(0)
        k_max = pl.num_programs(0) * E
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        base = i * E

        @pl.when((i == 0) & (eblk_ref[0] >= 0))
        def _():
            dma_for(eblk_ref, src_hbm, buf, sems, 0, 0).start()

        def entry(e, _):
            j = base + e
            nxt = jnp.minimum(j + 1, k_max - 1)

            @pl.when((j + 1 < k_max) & (eblk_ref[nxt] >= 0))
            def _():
                dma_for(eblk_ref, src_hbm, buf, sems, nxt,
                        jax.lax.rem(j + 1, 2)).start()

            @pl.when(eblk_ref[j] >= 0)
            def _compute():
                slot = jax.lax.rem(j, 2)
                dma_for(eblk_ref, src_hbm, buf, sems, j, slot).wait()
                t = tgt_ref[e]
                z0 = jnp.zeros((L,), jnp.float32)
                if kind == "hydro":
                    params = (params_ref[0, 0], params_ref[0, 1])

                    def body(g, acc):
                        s = buf[slot, g >> 2, (g >> 1) & 1, g & 1]
                        return hydro_compute(params, t, s, acc)

                    ax, ay, az, dte, msv = jax.lax.fori_loop(
                        0, 8, body, (z0, z0, z0, z0, z0))
                    out_ref[e, 0, :L] = ax
                    out_ref[e, 1, :L] = ay
                    out_ref[e, 2, :L] = az
                    out_ref[e, 3, :L] = dte
                    out_ref[e, 4, :L] = msv
                else:
                    ht = h_ref[e, 0, :L][:, None]

                    def body(g, acc):
                        s = buf[slot, g >> 2, (g >> 1) & 1, g & 1]
                        return density_compute(t, ht, s, acc)

                    rho, drhodh, divv, rx, ry, rz = jax.lax.fori_loop(
                        0, 8, body, (z0, z0, z0, z0, z0, z0))
                    out_ref[e, 0, :L] = rho
                    out_ref[e, 1, :L] = drhodh
                    out_ref[e, 2, :L] = divv
                    out_ref[e, 3, :L] = rx
                    out_ref[e, 4, :L] = ry
                    out_ref[e, 5, :L] = rz

            return 0

        jax.lax.fori_loop(0, E, entry, 0)

    return kernel


def density_sums_blocks_entries(cl_e: CellList, tgt, h_tiles, src_pad,
                                entry_blk, box: float,
                                interpret: bool = False):
    """Density sweep over compacted active entries: grid = (k_max,);
    ``entry_blk`` [k_max] holds real even-block ids (-1 = padding);
    ``tgt`` [k_max, 8, 128] target rows (first L lanes live); ``h_tiles``
    [k_max, 128] per-lane smoothing lengths; ``src_pad`` from
    _xyzpad_odd_full."""
    from gadget_leicester_tpu.ops.pallas_cells import (ENTRIES_PER_BLOCK,
                                                       ENTRY_LANES)
    k_max = tgt.shape[0]
    nb = cl_e.n_cells
    lanes = cl_e.cells.shape[1]
    e_blk = ENTRIES_PER_BLOCK
    k_pad = ((k_max + e_blk - 1) // e_blk) * e_blk
    h_tiles = h_tiles.reshape(k_max, 1, 128)
    if k_pad != k_max:
        pad = k_pad - k_max
        entry_blk = jnp.concatenate(
            [entry_blk, jnp.full((pad,), -1, jnp.int32)])
        tgt = jnp.concatenate(
            [tgt, jnp.zeros((pad, 8, 128), tgt.dtype)])
        h_tiles = jnp.concatenate(
            [h_tiles, jnp.ones((pad, 1, 128), h_tiles.dtype)])
    out = pl.pallas_call(
        _make_sph_entries_kernel(float(box), cl_e.periodic, nb, lanes,
                                 ENTRY_LANES, "density"),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k_pad // e_blk,),
            in_specs=[
                pl.BlockSpec((e_blk, 8, 128), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec((e_blk, 1, 128), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((e_blk, 8, 128),
                                   lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 2, 2, 8, lanes), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(entry_blk, tgt, h_tiles, src_pad)
    return out[:k_max]


def hydro_sums_blocks_entries(cl_e: CellList, tgt16, src_pad, entry_blk,
                              box: float, visc_const: float,
                              hubble_a2_flow, fac_mu,
                              interpret: bool = False):
    """Hydro sweep over compacted active entries. ``tgt16``
    [k_max, 16, 128]: rows 0-7 = kinematics (h at 7), 8-11 = rho,
    p_over_rho2*f, c_snd, balsara."""
    from gadget_leicester_tpu.ops.pallas_cells import (ENTRIES_PER_BLOCK,
                                                       ENTRY_LANES)
    k_max = tgt16.shape[0]
    nb = cl_e.n_cells
    lanes = cl_e.cells.shape[1]
    params = jnp.stack([jnp.asarray(hubble_a2_flow, jnp.float32),
                        jnp.asarray(fac_mu, jnp.float32)]).reshape(1, 2)
    e_blk = ENTRIES_PER_BLOCK
    k_pad = ((k_max + e_blk - 1) // e_blk) * e_blk
    if k_pad != k_max:
        pad = k_pad - k_max
        entry_blk = jnp.concatenate(
            [entry_blk, jnp.full((pad,), -1, jnp.int32)])
        tgt16 = jnp.concatenate(
            [tgt16, jnp.zeros((pad, 16, 128), tgt16.dtype)])
    out = pl.pallas_call(
        _make_sph_entries_kernel(float(box), cl_e.periodic, nb, lanes,
                                 ENTRY_LANES, "hydro",
                                 visc_const=float(visc_const)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k_pad // e_blk,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda bi, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((e_blk, 16, 128), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((e_blk, 8, 128),
                                   lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 2, 2, 16, lanes), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(entry_blk, params, tgt16, src_pad)
    return out[:k_max]


def _entries_target_gather(cl_e: CellList, entry_cell, entry_slot, table,
                           valid_of, rows_out: int):
    """[k_max, rows_out, 128] target tiles for the compacted entries:
    rows = table columns, first L lanes live, invalid lanes parked far
    with zero mass. Returns (tgt, pidx, valid)."""
    k_max, L = entry_slot.shape
    ec = jnp.maximum(entry_cell, 0)
    es = jnp.maximum(entry_slot, 0)
    pidx = cl_e.cells[ec[:, None], es]
    valid = (entry_cell[:, None] >= 0) & (entry_slot >= 0) & (pidx >= 0)
    pidx = jnp.where(valid, pidx, 0)
    valid = valid & valid_of(pidx)
    r = table.shape[1]
    rows = table[pidx]                                # [k_max, L, r]
    far = jnp.asarray(-7.0, table.dtype) / cl_e.inv_cell[0]
    park = jnp.concatenate([jnp.full((3,), far, table.dtype),
                            jnp.zeros((r - 3,), table.dtype)])
    rows = jnp.where(valid[:, :, None], rows, park[None, None, :])
    tgt = jnp.zeros((k_max, rows_out, 128), table.dtype)
    tgt = tgt.at[:, :r, :L].set(rows.transpose(0, 2, 1))
    return tgt, pidx, valid


def density_adaptive_blocks_entries(
    pos, vel, mass, hsml0, gas_mask, entry_cell, entry_slot,
    des_num_ngb: float, max_dev: float, box: float, cls,
    min_hsml: float = 0.0, max_hsml=None,
    periodic: bool = True, max_iters: int = 40,
    interpret: bool = False,
):
    """Adaptive-h density over compacted active entries (the per-particle
    economy of [G2: density.c] on TPU): pack, Newton solve, kernel grid
    and merge are ALL O(entries * ENTRY_LANES). entry_cell/entry_slot
    from pallas_cells.build_active_entries on the EVEN block list
    (caller guarantees total <= k_max via lax.cond to the dense path)."""
    from gadget_leicester_tpu.ops.pallas_cells import pack_sph_soa
    from gadget_leicester_tpu.ops.sph_dense import (DensityResult,
                                                    density_adaptive_generic)

    cl_e, cl_o = cls
    ng = pos.shape[0]
    nb = cl_e.n_cells
    k_max, L = entry_slot.shape

    with jax.named_scope("density_entries_pack"):
        ones = jnp.ones(ng, pos.dtype)
        table = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], mass,
                           vel[:, 0], vel[:, 1], vel[:, 2], ones], axis=1)
        gm = lambda idx: gas_mask[idx]  # noqa: E731
        tgt, pidx, valid = _entries_target_gather(
            cl_e, entry_cell, entry_slot, table, gm, 8)
        src_soa = pack_sph_soa(cl_o, pos, vel, mass, ones, gas_mask)
        src_pad = _xyzpad_odd_full(src_soa, nb, periodic)
        mass_slots = jnp.where(valid, mass[pidx], 0.0).reshape(-1)
        mask_slots = valid.reshape(-1)
        h0_slots = jnp.where(valid, hsml0[pidx], 1.0).reshape(-1)

    def sweep(h_slots, undone=None):
        ids = entry_cell
        if undone is not None:
            e_undone = jnp.any(undone.reshape(k_max, L), axis=1)
            ids = jnp.where(e_undone, entry_cell, -1)
        h_tiles = jnp.zeros((k_max, 128), jnp.float32).at[:, :L].set(
            h_slots.reshape(k_max, L))
        out = density_sums_blocks_entries(cl_e, tgt, h_tiles, src_pad,
                                          ids, box, interpret=interpret)
        lout = out[:, :, :L]
        rho = lout[:, 0, :].reshape(-1)
        drhodh = lout[:, 1, :].reshape(-1)
        divv = lout[:, 2, :].reshape(-1)
        rot = jnp.stack([lout[:, 3, :].reshape(-1),
                         lout[:, 4, :].reshape(-1),
                         lout[:, 5, :].reshape(-1)], axis=-1)
        return rho, drhodh, divv, rot

    res_slots = density_adaptive_generic(
        sweep, mass_slots, h0_slots, mask_slots, des_num_ngb, max_dev,
        min_hsml=min_hsml, max_hsml=max_hsml, max_iters=max_iters)

    with jax.named_scope("density_entries_merge"):
        flat_idx = jnp.where(valid, pidx, ng).reshape(-1)

        def to_part(x_slots, fill=0.0):
            return jnp.full((ng + 1,), fill, x_slots.dtype).at[
                flat_idx].set(x_slots, mode="drop")[:ng]

        return DensityResult(
            rho=to_part(res_slots.rho),
            dhsml_factor=to_part(res_slots.dhsml_factor, 1.0),
            div_vel=to_part(res_slots.div_vel),
            curl_vel=to_part(res_slots.curl_vel),
            num_ngb_eff=to_part(res_slots.num_ngb_eff),
            hsml=to_part(res_slots.hsml, 1.0),
            iters=res_slots.iters,
        )


def hydro_force_blocks_entries(
    cls, pos, vel, mass, hsml, rho, pressure, dhsml_factor,
    div_vel, curl_vel, gas_mask, entry_cell, entry_slot,
    visc_const: float, box: float,
    hubble_a2_flow=0.0, hubble_a2_norm=1.0, fac_mu=1.0,
    interpret: bool = False,
):
    """Hydro force over compacted active entries (see
    density_adaptive_blocks_entries for the contract)."""
    from gadget_leicester_tpu.core.config import GAMMA, GAMMA_MINUS1
    from gadget_leicester_tpu.ops.pallas_cells import pack_sph_soa
    from gadget_leicester_tpu.ops.sph_dense import HydroResult

    cl_e, cl_o = cls
    ng = pos.shape[0]
    nb = cl_e.n_cells
    periodic = cl_e.periodic
    k_max, L = entry_slot.shape
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    c_snd = jnp.sqrt(GAMMA * pressure / rho_safe)
    p_over_rho2 = pressure / rho_safe**2 * dhsml_factor
    h_safe = jnp.where(hsml > 0, hsml, 1.0)
    balsara = jnp.abs(div_vel) / (
        jnp.abs(div_vel) + curl_vel + 1e-4 * c_snd / h_safe / fac_mu)

    with jax.named_scope("hydro_entries_pack"):
        table_a = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], mass,
                             vel[:, 0], vel[:, 1], vel[:, 2], hsml], axis=1)
        gmf = gas_mask.astype(pos.dtype)
        zero = jnp.zeros_like(gmf)
        table_b = jnp.stack([rho, p_over_rho2, c_snd, balsara, gmf,
                             zero, zero, zero], axis=1)
        table16 = jnp.concatenate([table_a, table_b], axis=1)
        gm = lambda idx: gas_mask[idx]  # noqa: E731
        tgt16, pidx, valid = _entries_target_gather(
            cl_e, entry_cell, entry_slot, table16, gm, 16)
        src_a = pack_sph_soa(cl_o, pos, vel, mass, hsml, gas_mask)
        idx_o = jnp.maximum(cl_o.cells, 0)
        valid_o = ((cl_o.cells >= 0) & gas_mask[idx_o]).astype(pos.dtype)
        zero_o = jnp.zeros_like(valid_o)
        src_b = jnp.stack([rho[idx_o], p_over_rho2[idx_o], c_snd[idx_o],
                           balsara[idx_o], valid_o, zero_o, zero_o, zero_o],
                          axis=1)
        src16 = jnp.concatenate([src_a, src_b], axis=1)
        src_pad = _xyzpad_odd_full(src16, nb, periodic)

    out = hydro_sums_blocks_entries(cl_e, tgt16, src_pad, entry_cell, box,
                                    visc_const, hubble_a2_flow, fac_mu,
                                    interpret=interpret)

    with jax.named_scope("hydro_entries_merge"):
        idxm = jnp.where(valid, pidx, ng).reshape(-1)
        lout = out[:, :, :L]

        def sc(r):
            return jnp.zeros((ng + 1,), out.dtype).at[idxm].set(
                lout[:, r, :].reshape(-1), mode="drop")[:ng]

        acc = jnp.stack([sc(0), sc(1), sc(2)], axis=-1)
        dt_raw, msv = sc(3), sc(4)
    dt_ent = dt_raw * GAMMA_MINUS1 / (
        jnp.asarray(hubble_a2_norm, rho.dtype) * rho_safe**GAMMA_MINUS1)
    gmask = gas_mask
    return HydroResult(
        acc=jnp.where(gmask[:, None], acc, 0.0),
        dt_entropy=jnp.where(gmask, dt_ent, 0.0),
        max_signal_vel=jnp.where(gmask, msv, 0.0),
    )
