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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gadget_leicester_tpu.ops.jit_util import hybrid_jit
from gadget_leicester_tpu.ops.neighbors import CellList


def build_block_lists(pos, mask, origin, extent, n_blocks: int,
                      subcap: int, periodic: bool):
    """Bin into a (2*n_blocks)^3 fine grid; return (even, odd) CellLists
    whose ``cells`` are [B, 8*subcap] tiles (lane = subcell*subcap + rank).

    One sort serves both packings: ranks are within FINE subcells, which
    even and odd blocks merely regroup. Overflow = any fine cell > subcap.
    """
    n = pos.shape[0]
    m = 2 * n_blocks
    nb = n_blocks
    origin = jnp.broadcast_to(jnp.asarray(origin, pos.dtype), (3,))
    extent = jnp.broadcast_to(jnp.asarray(extent, pos.dtype), (3,))
    inv_cell = m / extent
    rel = (pos - origin) * inv_cell
    coords = jnp.floor(rel).astype(jnp.int32)
    if periodic:
        coords = jnp.mod(coords, m)
    else:
        coords = jnp.clip(coords, 0, m - 1)
    cid_f = (coords[..., 0] * m + coords[..., 1]) * m + coords[..., 2]
    total_f = m**3
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

    def pack(c, nb_eff):
        """c: [N,3] fine coords (possibly shifted); returns flat block id
        and lane for each sorted particle."""
        b = c >> 1
        s = c & 1
        bid = (b[:, 0] * nb_eff + b[:, 1]) * nb_eff + b[:, 2]
        sub = (s[:, 0] * 2 + s[:, 1]) * 2 + s[:, 2]
        return bid, sub * subcap + rank

    lanes = 8 * subcap
    # even packing
    bid_e, lane_e = pack(c_sorted, nb)
    n_e = nb**3
    cells_e = jnp.full((n_e + 1, lanes), -1, jnp.int32)
    cells_e = cells_e.at[
        jnp.where(ok, bid_e, n_e), jnp.where(ok, lane_e, 0)
    ].set(jnp.where(ok, order.astype(jnp.int32), -1), mode="drop")

    # odd packing: shift fine coords by +1 (block w holds {2w-1, 2w})
    if periodic:
        c_o = jnp.mod(c_sorted + 1, m)
        nb_o = nb
    else:
        c_o = c_sorted + 1
        nb_o = nb + 1
    bid_o, lane_o = pack(c_o, nb_o)
    n_o = nb_o**3
    cells_o = jnp.full((n_o + 1, lanes), -1, jnp.int32)
    cells_o = cells_o.at[
        jnp.where(ok, bid_o, n_o), jnp.where(ok, lane_o, 0)
    ].set(jnp.where(ok, order.astype(jnp.int32), -1), mode="drop")

    counts = jnp.zeros((total_f + 1,), jnp.int32).at[cid_sorted].add(1)
    overflow = jnp.any(counts[:total_f] > subcap)

    def mk(cells, nb_):
        return CellList(cells=cells, cell_of=cid_f, counts=counts[:total_f],
                        overflow=overflow, origin=origin, inv_cell=inv_cell,
                        n_cells=nb_, periodic=periodic)

    return mk(cells_e[:n_e], nb), mk(cells_o[:n_o], nb_o)


def fine_candidate_indices(cl_e: CellList, target_pos):
    """[T, 27*subcap] candidate particle rows for arbitrary target
    positions, sourced from the even block list's FINE cells: the lane
    layout lane = subcell*subcap + rank (build_block_lists) means fine
    cell (block b, subcell s) is the contiguous row b*8+s of
    cells.reshape(nb^3*8, subcap) — so the block packing doubles as a
    fine cell list for compacted-active sweeps."""
    nb = cl_e.n_cells
    m = 2 * nb
    lanes = cl_e.cells.shape[1]
    subcap = lanes // 8
    rel = (target_pos - cl_e.origin) * cl_e.inv_cell
    coords = jnp.floor(rel).astype(jnp.int32)
    if cl_e.periodic:
        coords = jnp.mod(coords, m)
    else:
        coords = jnp.clip(coords, 0, m - 1)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), -1
    ).reshape(27, 3)
    c = coords[:, None, :] + offs                    # [T,27,3]
    if cl_e.periodic:
        c = jnp.mod(c, m)
        valid = jnp.ones(c.shape[:-1], bool)
    else:
        valid = jnp.all((c >= 0) & (c < m), axis=-1)
        c = jnp.clip(c, 0, m - 1)
    b = c >> 1
    s = c & 1
    bid = (b[..., 0] * nb + b[..., 1]) * nb + b[..., 2]
    sub = (s[..., 0] * 2 + s[..., 1]) * 2 + s[..., 2]
    table = cl_e.cells.reshape(nb ** 3 * 8, subcap)
    cand = table[bid * 8 + sub]                      # [T,27,subcap]
    cand = jnp.where(valid[..., None], cand, -1)
    return cand.reshape(target_pos.shape[0], -1)


def _needed_odd(flags_e, nb: int, periodic: bool):
    """[B] even-tile activity flags -> [Bo] bool mask of odd blocks that
    any active even tile reads: even target b streams odd sources b+g,
    g in {0,1}^3 (periodic wrap / the (nb+1)^3 odd grid)."""
    g = flags_e.reshape(nb, nb, nb).astype(bool)
    if periodic:
        for ax in range(3):
            g = g | jnp.roll(g, 1, axis=ax)
        return g.reshape(-1)
    out = jnp.zeros((nb + 1,) * 3, bool).at[:nb, :nb, :nb].set(g)
    for ax in range(3):
        pads = [(0, 0)] * 3
        pads[ax] = (1, 0)
        sl = [slice(None)] * 3
        sl[ax] = slice(0, nb + 1)
        out = out | jnp.pad(out, pads)[tuple(sl)]
    return out.reshape(-1)


def _zpad_odd(arr, nb, periodic):
    """Odd-packing arrays [Bo, rows, lanes] -> z-contiguous layout so the
    two gz-source blocks of a (gx,gy) column are ADJACENT rows (one DMA):
    periodic grids append a z-wrap copy ([nb,nb,nb+1] rows); non-periodic
    odd grids are already (nb+1)^3 and contiguous."""
    if not periodic:
        return arr
    r, l = arr.shape[1], arr.shape[2]
    a = arr.reshape(nb, nb, nb, r, l)
    a = jnp.concatenate([a, a[:, :, :1]], axis=2)
    return a.reshape(nb * nb * (nb + 1), r, l)


def _src_pair_base(b, g4, nb, periodic):
    """Flat base row (in the _zpad_odd layout) of the (gx,gy) column's
    two z-consecutive source blocks for even target block b."""
    bx = b // (nb * nb)
    rem = b % (nb * nb)
    by, bz = rem // nb, rem % nb
    gx, gy = g4 >> 1, g4 & 1
    if periodic:
        ox, oy = (bx + gx) % nb, (by + gy) % nb
        return (ox * nb + oy) * (nb + 1) + bz
    ox, oy = bx + gx, by + gy
    nb_o = nb + 1
    return (ox * nb_o + oy) * nb_o + bz


def _src_block_traced(b, g, nb, periodic):
    """Flat odd-block id of source g (0..7) for even target block b."""
    bx = b // (nb * nb)
    rem = b % (nb * nb)
    by, bz = rem // nb, rem % nb
    gx, gy, gz = g >> 2, (g >> 1) & 1, g & 1
    if periodic:
        ox, oy, oz = (bx + gx) % nb, (by + gy) % nb, (bz + gz) % nb
        nb_o = nb
    else:
        # odd grid has nb+1 blocks per axis; b+g is always in range
        ox, oy, oz = bx + gx, by + gy, bz + gz
        nb_o = nb + 1
    return (ox * nb_o + oy) * nb_o + oz


def _pair_geom_minimage(t, s, box, periodic):
    dx = t[0, :][:, None] - s[0, :][None, :]
    dy = t[1, :][:, None] - s[1, :][None, :]
    dz = t[2, :][:, None] - s[2, :][None, :]
    if periodic:
        dx = dx - box * jnp.round(dx * (1.0 / box))
        dy = dy - box * jnp.round(dy * (1.0 / box))
        dz = dz - box * jnp.round(dz * (1.0 / box))
    r2 = dx * dx + dy * dy + dz * dz
    rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
    return dx, dy, dz, r2 * rinv, rinv


def _make_density_block_kernel(box, periodic, nb, lanes, dma: bool,
                               sparse: bool = False):
    from gadget_leicester_tpu.ops.sph_kernels import (kernel_dw_dr,
                                                      kernel_w_and_dwdh)

    def compute(t, ht, s, acc):
        rho, drhodh, divv, rx, ry, rz = acc
        dx, dy, dz, r, rinv = _pair_geom_minimage(t, s, box, periodic)
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
                acc = compute(t, ht, buf[slot, 0], acc)
                return compute(t, ht, buf[slot, 1], acc)

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
            rho, drhodh, divv, rx, ry, rz = compute(t, ht, src_ref[0], acc)
            out_ref[0, 0, :] = rho
            out_ref[0, 1, :] = drhodh
            out_ref[0, 2, :] = divv
            out_ref[0, 3, :] = rx
            out_ref[0, 4, :] = ry
            out_ref[0, 5, :] = rz

    return kernel_grid


def _src_index_fn(nb, periodic):
    def src_index(bi, g):
        bx = bi // (nb * nb)
        rem = bi % (nb * nb)
        by, bz = rem // nb, rem % nb
        gx, gy, gz = g >> 2, (g >> 1) & 1, g & 1
        if periodic:
            ox, oy, oz = (bx + gx) % nb, (by + gy) % nb, (bz + gz) % nb
            nb_o = nb
        else:
            ox, oy, oz = bx + gx, by + gy, bz + gz
            nb_o = nb + 1
        return ((ox * nb_o + oy) * nb_o + oz, 0, 0)
    return src_index


def density_sums_blocks(cl_e: CellList, soa_e, soa_o, h_slots, box: float,
                        interpret: bool = False, flags=None):
    """Density sweep on block tiles. soa_e/soa_o: [B,8,lanes]/[Bo,8,lanes]
    from pack_sph_soa on the even/odd lists; h_slots [B, lanes]. Returns
    [B, 8, lanes] rows (rho, drhodh, divv, rot xyz). ``flags`` [B,1] int32
    gates tiles (DMA path only; None = all on)."""
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
                                       dma=False),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, 8, lanes), soa_e.dtype),
            interpret=True,
        )(flags, soa_e, soa_o, h_slots.reshape(b, 1, lanes))
    return pl.pallas_call(
        _make_density_block_kernel(float(box), periodic, nb, lanes, dma=True),
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
                             dma: bool, sparse: bool = False):
    from gadget_leicester_tpu.ops.sph_kernels import kernel_dw_dr

    def compute(params, ta, tb, s16, acc):
        # s16 rows: 0-7 = soa_a (x,y,z,m,vx,vy,vz,h);
        #           8-12 = soa_b (rho, p_over_rho2*f, c+..., balsara, valid)
        hubble_a2_flow, fac_mu = params
        ax_a, ay_a, az_a, dte, msv_a = acc
        sa = s16[:8]
        dx, dy, dz, r, rinv = _pair_geom_minimage(ta, sa, box, periodic)
        ht = ta[7, :][:, None]
        hs = sa[7, :][None, :]
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
                acc = compute(params, ta, tb, buf[slot, 0], acc)
                return compute(params, ta, tb, buf[slot, 1], acc)

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
            ax, ay, az, dte, msv = compute(params, tgt_a[0], tgt_b[0],
                                           src_ref[0], acc)
            out_ref[0, 0, :] = ax
            out_ref[0, 1, :] = ay
            out_ref[0, 2, :] = az
            out_ref[0, 3, :] = dte
            out_ref[0, 4, :] = msv

    return kernel_grid


def hydro_sums_blocks(cl_e: CellList, soa_a, soa_b, src16, box: float,
                      visc_const: float, hubble_a2_flow, fac_mu,
                      interpret: bool = False, flags=None):
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
                                     float(visc_const), dma=False),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, 8, lanes), soa_a.dtype),
            interpret=True,
        )(flags, params, soa_a, soa_b, src16)
    return pl.pallas_call(
        _make_hydro_block_kernel(float(box), periodic, nb, lanes,
                                 float(visc_const), dma=True),
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
    box: float, n_blocks: int, subcap: int = 32,
    min_hsml: float = 0.0, max_hsml=None,
    periodic: bool = True, max_iters: int = 40,
    origin=0.0, extent=None, interpret: bool = False,
    active=None, cls=None,
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
                                  interpret=interpret, flags=fl)
        rho = out[:, 0, :].reshape(-1)
        drhodh = out[:, 1, :].reshape(-1)
        divv = out[:, 2, :].reshape(-1)
        rot = jnp.stack([out[:, 3, :].reshape(-1), out[:, 4, :].reshape(-1),
                         out[:, 5, :].reshape(-1)], axis=-1)
        return rho, drhodh, divv, rot

    res_slots = density_adaptive_generic(
        sweep, mass_slots, h0_slots, mask_slots, des_num_ngb, max_dev,
        min_hsml=min_hsml, max_hsml=max_hsml, max_iters=max_iters)

    flat_idx = jnp.where(mask_slots, idx.reshape(-1), ng)

    def to_part(x_slots, fill=0.0):
        return jnp.full((ng + 1,), fill, x_slots.dtype).at[flat_idx].set(
            x_slots, mode="drop")[:ng]

    with jax.named_scope("density_merge"):
        res = DensityResult(
            rho=to_part(res_slots.rho),
            dhsml_factor=to_part(res_slots.dhsml_factor, 1.0),
            div_vel=to_part(res_slots.div_vel),
            curl_vel=to_part(res_slots.curl_vel),
            num_ngb_eff=to_part(res_slots.num_ngb_eff),
            hsml=to_part(res_slots.hsml, 1.0),
            iters=res_slots.iters,
        )
    return res, (cl_e, cl_o)


def hydro_force_blocks(
    cls, pos, vel, mass, hsml, rho, pressure, dhsml_factor,
    div_vel, curl_vel, gas_mask, visc_const: float, box: float,
    hubble_a2_flow=0.0, hubble_a2_norm=1.0, fac_mu=1.0,
    interpret: bool = False, active=None,
):
    """Entropy-form hydro force on block tiles; cls = (cl_even, cl_odd)
    from density_adaptive_blocks. [G2: hydra.c :: hydro_evaluate()]"""
    from gadget_leicester_tpu.core.config import GAMMA, GAMMA_MINUS1
    from gadget_leicester_tpu.ops.pallas_cells import (pack_sph_soa,
                                                       scatter_cell_rows)
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

        soa_a = pack_sph_soa(cl_e, pos, vel, mass, hsml, gas_mask)

        def soa_b_of(cl):
            idx = jnp.maximum(cl.cells, 0)
            valid = ((cl.cells >= 0) & gas_mask[idx]).astype(pos.dtype)
            zero = jnp.zeros_like(valid)
            return jnp.stack([rho[idx], p_over_rho2[idx], c_snd[idx],
                              balsara[idx], valid, zero, zero, zero], axis=1)

        soa_b = soa_b_of(cl_e)
        src_a = pack_sph_soa(cl_o, pos, vel, mass, hsml, gas_mask)
        src16 = jnp.concatenate([src_a, soa_b_of(cl_o)], axis=1)

    out = hydro_sums_blocks(cl_e, soa_a, soa_b, src16, box, visc_const,
                            hubble_a2_flow, fac_mu, interpret=interpret,
                            flags=flags)
    with jax.named_scope("hydro_merge"):
        ax, ay, az, dt_raw, msv = scatter_cell_rows(cl_e, out, ng,
                                                    rows=(0, 1, 2, 3, 4))
        acc = jnp.stack([ax, ay, az], axis=-1)
    dt_ent = dt_raw * GAMMA_MINUS1 / (
        jnp.asarray(hubble_a2_norm, rho.dtype) * rho_safe**GAMMA_MINUS1)
    gm = gas_mask
    return HydroResult(
        acc=jnp.where(gm[:, None], acc, 0.0),
        dt_entropy=jnp.where(gm, dt_ent, 0.0),
        max_signal_vel=jnp.where(gm, msv, 0.0),
    )


# ---------------------------------------------------------------------------
# sparse (compacted active-tile) variants for nearly-idle sync points
# [G2: timestep.c / density.c — the active list IS the work list]
# ---------------------------------------------------------------------------


def sph_block_flags(cl_e: CellList, active):
    """[B] int32 even-block activity flags via an O(N) scatter over the
    cached fine-cell assignments (cell_of) — no [B, lanes] gather, usable
    before any pack exists. Stale assignments are fine: gating only needs
    to agree with the cells[] the kernel will walk."""
    nb = cl_e.n_cells
    m = 2 * nb
    cid = cl_e.cell_of
    cx = cid // (m * m)
    rem = cid % (m * m)
    cy, cz = rem // m, rem % m
    bid = ((cx >> 1) * nb + (cy >> 1)) * nb + (cz >> 1)
    b3 = nb ** 3
    dst = jnp.where(active, bid, b3)
    return jnp.zeros((b3 + 1,), jnp.int32).at[dst].max(
        jnp.ones_like(dst), mode="drop")[:b3]


def _sparse_target_pack(cl_e: CellList, act_ids, table, valid_of):
    """Gather [k_act, rows, lanes] target tiles for the compacted even
    blocks. ``valid_of(idx)`` -> bool per slot (mask semantics of the
    caller). Returns (soa_t, idx_a, valid_a); invalid slots are parked
    far away with zero mass."""
    cells_a = cl_e.cells[jnp.maximum(act_ids, 0)]
    idx_a = jnp.maximum(cells_a, 0)
    valid_a = (cells_a >= 0) & valid_of(idx_a) & (act_ids >= 0)[:, None]
    rows = table[idx_a]                      # [k_act, lanes, R]
    r = table.shape[1]
    far = jnp.asarray(-7.0, table.dtype) / cl_e.inv_cell[0]
    park = jnp.concatenate([jnp.full((3,), far, table.dtype),
                            jnp.zeros((r - 3,), table.dtype)])
    rows = jnp.where(valid_a[:, :, None], rows, park[None, None, :])
    return rows.transpose(0, 2, 1), idx_a, valid_a


def _sparse_odd_source(cl_o: CellList, need_ids, table, valid_of, nb,
                       periodic):
    """Scatter-build the FULL-geometry odd source SoA from only the
    ``needed`` blocks (zeros elsewhere: zero mass / zero valid-row rows
    contribute nothing to any sum), then z-pad for the column DMAs."""
    b_o = cl_o.cells.shape[0]
    r = table.shape[1]
    lanes = cl_o.cells.shape[1]
    cells_n = cl_o.cells[jnp.maximum(need_ids, 0)]
    idx_n = jnp.maximum(cells_n, 0)
    valid_n = (cells_n >= 0) & valid_of(idx_n) & (need_ids >= 0)[:, None]
    rows = jnp.where(valid_n[:, :, None], table[idx_n], 0.0)
    dst = jnp.where(need_ids >= 0, need_ids, b_o)
    src = jnp.zeros((b_o + 1, r, lanes), table.dtype).at[dst].set(
        rows.transpose(0, 2, 1), mode="drop")[:b_o]
    return _zpad_odd(src, nb, periodic)


def density_sums_blocks_sparse(cl_e: CellList, soa_t, h_tiles, src_zpad,
                               act_ids, box: float,
                               interpret: bool = False):
    """Density sweep over a COMPACTED tile list: grid = (k_act,), the
    prefetched vector holds real even-block ids (-1 = padding)."""
    k_act, _, lanes = soa_t.shape
    nb = cl_e.n_cells
    periodic = cl_e.periodic
    return pl.pallas_call(
        _make_density_block_kernel(float(box), periodic, nb, lanes,
                                   dma=True, sparse=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k_act,),
            in_specs=[
                pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec((1, 1, lanes), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, lanes), lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 8, lanes), soa_t.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((k_act, 8, lanes), soa_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(act_ids, soa_t, h_tiles.reshape(k_act, 1, lanes), src_zpad)


def hydro_sums_blocks_sparse(cl_e: CellList, soa_a, soa_b, src_zpad,
                             act_ids, box: float, visc_const: float,
                             hubble_a2_flow, fac_mu,
                             interpret: bool = False):
    """Hydro sweep over a COMPACTED tile list (see
    density_sums_blocks_sparse)."""
    k_act, _, lanes = soa_a.shape
    nb = cl_e.n_cells
    periodic = cl_e.periodic
    params = jnp.stack([jnp.asarray(hubble_a2_flow, soa_a.dtype),
                        jnp.asarray(fac_mu, soa_a.dtype)]).reshape(1, 2)
    return pl.pallas_call(
        _make_hydro_block_kernel(float(box), periodic, nb, lanes,
                                 float(visc_const), dma=True, sparse=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k_act,),
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
        out_shape=jax.ShapeDtypeStruct((k_act, 8, lanes), soa_a.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(act_ids, params, soa_a, soa_b, src_zpad)


def density_adaptive_blocks_sparse(
    pos, vel, mass, hsml0, gas_mask, active, flags_e,
    des_num_ngb: float, max_dev: float, box: float,
    k_act: int, k_pack: int, cls,
    min_hsml: float = 0.0, max_hsml=None,
    periodic: bool = True, max_iters: int = 40,
    interpret: bool = False,
):
    """Sparse counterpart of density_adaptive_blocks: pack, Newton
    solve, kernel grid, and merge are ALL sized by the compacted
    active/needed tile lists (k_act even targets, k_pack odd sources)
    instead of B or N. The caller guarantees count(flags_e) <= k_act and
    count(_needed_odd(flags_e)) <= k_pack (lax.cond to the dense path
    otherwise). Inactive particles' outputs are zero — the caller keeps
    their drift-predicted fields [G2: density.c active-list economy]."""
    from gadget_leicester_tpu.ops.sph_dense import (DensityResult,
                                                    density_adaptive_generic)

    cl_e, cl_o = cls
    ng = pos.shape[0]
    nb = cl_e.n_cells
    lanes = cl_e.cells.shape[1]

    with jax.named_scope("density_sparse_pack"):
        act_ids = jnp.nonzero(flags_e > 0, size=k_act,
                              fill_value=-1)[0].astype(jnp.int32)
        need_ids = jnp.nonzero(_needed_odd(flags_e > 0, nb, periodic),
                               size=k_pack,
                               fill_value=-1)[0].astype(jnp.int32)
        ones = jnp.ones(ng, pos.dtype)
        table = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], mass,
                           vel[:, 0], vel[:, 1], vel[:, 2], ones], axis=1)
        gm = lambda idx: gas_mask[idx]  # noqa: E731
        soa_t, idx_a, valid_t = _sparse_target_pack(cl_e, act_ids, table, gm)
        src_zpad = _sparse_odd_source(cl_o, need_ids, table, gm, nb,
                                      periodic)
        # solve only ACTIVE targets (dense path: valid &= active[idx])
        valid_a = valid_t & active[idx_a]
        mass_slots = soa_t[:, 3, :].reshape(-1)
        mask_slots = valid_a.reshape(-1)
        h0_slots = jnp.where(valid_a, hsml0[idx_a], 1.0).reshape(-1)

    def sweep(h_slots, undone=None):
        ids = act_ids
        if undone is not None:
            tile_undone = jnp.any(undone.reshape(k_act, lanes), axis=1)
            ids = jnp.where(tile_undone, act_ids, -1)
        out = density_sums_blocks_sparse(
            cl_e, soa_t, h_slots.reshape(k_act, lanes), src_zpad, ids,
            box, interpret=interpret)
        rho = out[:, 0, :].reshape(-1)
        drhodh = out[:, 1, :].reshape(-1)
        divv = out[:, 2, :].reshape(-1)
        rot = jnp.stack([out[:, 3, :].reshape(-1), out[:, 4, :].reshape(-1),
                         out[:, 5, :].reshape(-1)], axis=-1)
        return rho, drhodh, divv, rot

    res_slots = density_adaptive_generic(
        sweep, mass_slots, h0_slots, mask_slots, des_num_ngb, max_dev,
        min_hsml=min_hsml, max_hsml=max_hsml, max_iters=max_iters)

    with jax.named_scope("density_sparse_merge"):
        flat_idx = jnp.where(mask_slots, idx_a.reshape(-1), ng)

        def to_part(x_slots, fill=0.0):
            return jnp.full((ng + 1,), fill, x_slots.dtype).at[flat_idx].set(
                x_slots, mode="drop")[:ng]

        return DensityResult(
            rho=to_part(res_slots.rho),
            dhsml_factor=to_part(res_slots.dhsml_factor, 1.0),
            div_vel=to_part(res_slots.div_vel),
            curl_vel=to_part(res_slots.curl_vel),
            num_ngb_eff=to_part(res_slots.num_ngb_eff),
            hsml=to_part(res_slots.hsml, 1.0),
            iters=res_slots.iters,
        )


def hydro_force_blocks_sparse(
    cls, pos, vel, mass, hsml, rho, pressure, dhsml_factor,
    div_vel, curl_vel, gas_mask, flags_e, k_act: int, k_pack: int,
    visc_const: float, box: float,
    hubble_a2_flow=0.0, hubble_a2_norm=1.0, fac_mu=1.0,
    interpret: bool = False,
):
    """Sparse counterpart of hydro_force_blocks (see
    density_adaptive_blocks_sparse for the contract)."""
    from gadget_leicester_tpu.core.config import GAMMA, GAMMA_MINUS1
    from gadget_leicester_tpu.ops.sph_dense import HydroResult

    cl_e, cl_o = cls
    ng = pos.shape[0]
    nb = cl_e.n_cells
    periodic = cl_e.periodic
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    c_snd = jnp.sqrt(GAMMA * pressure / rho_safe)
    p_over_rho2 = pressure / rho_safe**2 * dhsml_factor
    h_safe = jnp.where(hsml > 0, hsml, 1.0)
    balsara = jnp.abs(div_vel) / (
        jnp.abs(div_vel) + curl_vel + 1e-4 * c_snd / h_safe / fac_mu)

    with jax.named_scope("hydro_sparse_pack"):
        act_ids = jnp.nonzero(flags_e > 0, size=k_act,
                              fill_value=-1)[0].astype(jnp.int32)
        need_ids = jnp.nonzero(_needed_odd(flags_e > 0, nb, periodic),
                               size=k_pack,
                               fill_value=-1)[0].astype(jnp.int32)
        table_a = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], mass,
                             vel[:, 0], vel[:, 1], vel[:, 2], hsml], axis=1)
        gmf = gas_mask.astype(pos.dtype)
        zero = jnp.zeros_like(gmf)
        table_b = jnp.stack([rho, p_over_rho2, c_snd, balsara, gmf,
                             zero, zero, zero], axis=1)
        gm = lambda idx: gas_mask[idx]  # noqa: E731
        soa_a, idx_a, valid_a = _sparse_target_pack(cl_e, act_ids,
                                                    table_a, gm)
        # b-rows carry no positions: zero rows suffice for invalid slots
        # (their valid column is 0 -> `inside` masks every pair)
        cells_a = cl_e.cells[jnp.maximum(act_ids, 0)]
        bidx = jnp.maximum(cells_a, 0)
        brows = jnp.where(valid_a[:, :, None], table_b[bidx], 0.0)
        soa_b = brows.transpose(0, 2, 1)
        src_zpad = _sparse_odd_source(
            cl_o, need_ids, jnp.concatenate([table_a, table_b], axis=1),
            gm, nb, periodic)

    out = hydro_sums_blocks_sparse(cl_e, soa_a, soa_b, src_zpad, act_ids,
                                   box, visc_const, hubble_a2_flow, fac_mu,
                                   interpret=interpret)

    with jax.named_scope("hydro_sparse_merge"):
        keep = (cells_a >= 0) & (act_ids >= 0)[:, None]
        idxm = jnp.where(keep, bidx, ng).reshape(-1)

        def sc(r):
            return jnp.zeros((ng + 1,), out.dtype).at[idxm].set(
                out[:, r, :].reshape(-1), mode="drop")[:ng]

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
