"""Pallas TPU cell-pair kernels — the speed-of-light path for short-range
forces (the rebuild of the reference's hottest loop [G2: forcetree.c ::
force_treeevaluate_shortrange()] as a tiled VPU kernel).

Layout: particles are binned into cells (ops.neighbors.build_cell_list),
then gathered into a dense SoA tile per cell:

    cells_soa [C, 8, cap] f32, rows = x, y, z, mass, soft, valid, 0, 0

with cap a lane-width multiple (128). The kernel runs on a (C, 27) grid:
program (c, j) evaluates target cell c against its j-th stencil neighbour
(neighbour ids scalar-prefetched), accumulating into the output tile for
cell c which stays VMEM-resident across the 27 j-steps (revisited-block
accumulation). All pairwise math is [cap, cap] = [128, 128] — exactly one
VPU tile per op, zero padding waste beyond cell occupancy.

This replaces the jnp stencil path's [block, 27*cap] gathers (which
re-read every neighbour tile from HBM per target block) with VMEM reuse:
each source tile is read once per target cell instead of once per target
block row — the HBM-bandwidth fix SURVEY.md §7 calls for.
"""

from __future__ import annotations

from functools import partial

from gadget_leicester_tpu.ops.jit_util import hybrid_jit

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gadget_leicester_tpu.ops.neighbors import (CellList, _axes3,
                                                build_cell_list)


def pack_cells_soa(cl: CellList, pos, mass, soft, alive, needed=None,
                   active=None, relative=False):
    """[C, 8, cap] SoA tiles from a cell list.

    ``relative``: store positions RELATIVE to the assigned cell's center
    (minimum-imaged at pack time on periodic axes). Consumers then apply
    per-tile-constant stencil shifts (offset * cell_edge) instead of a
    per-pair minimum image — ~9 fewer VPU ops per pair in the hot
    kernels, exact for any in-margin stale assignment (a wrapped
    particle's rel coordinate is wrap-invariant), and better f32
    geometry (coordinates are O(cell) instead of O(box)).

    ONE [N,8]-row gather + transpose instead of six separate scalar
    gathers (per-gather op overhead dominated the old form). Row 6 =
    1/soft so kernels avoid per-pair reciprocals; invalid slots park at
    a FINITE far offset (1e30 would overflow r^2 to inf in f32 and leak
    NaN through 0*inf in masked products).

    ``needed`` ([C] bool, None = all): tiles that no gated kernel tile
    will read collapse their gather to row 0 and pack as parked — the
    active-set economy of [G2: timestep.c] applied to the pack itself.

    ``active`` ([N] bool, None): rides the otherwise-zero row 7, so tile
    activity flags come from a cheap reduce over the packed tiles instead
    of a second [C,cap] gather (cell_activity_flags costs ~45 ms at 4.2M;
    this row is free — the pack fetches 8-float rows either way)."""
    c, cap = cl.cells.shape
    idx = jnp.maximum(cl.cells, 0)
    valid = (cl.cells >= 0) & alive[idx]
    if needed is not None:
        valid = valid & needed[:, None]
        idx = jnp.where(needed[:, None], idx, 0)
    soft_inv = jnp.where(soft > 0, 1.0 / soft, 0.0)
    row7 = jnp.zeros_like(mass) if active is None else \
        active.astype(mass.dtype)
    table = jnp.stack(
        [pos[:, 0], pos[:, 1], pos[:, 2], mass, soft,
         jnp.ones_like(mass), soft_inv, row7], axis=1)
    rows = table[idx]                       # [C, cap, 8]
    if relative:
        centers = _cell_centers(cl, pos.dtype)          # [C, 3]
        rel = rows[:, :, :3] - centers[:, None, :]
        ext = jnp.asarray(_axes3(cl.n_cells), pos.dtype) / cl.inv_cell
        per = jnp.asarray(_axes3(cl.periodic), bool)
        rel = jnp.where(per, rel - ext * jnp.round(rel / ext), rel)
        rows = jnp.concatenate([rel, rows[:, :, 3:]], axis=-1)
    far = -7.0 / cl.inv_cell[0]
    park = jnp.stack([far, far, far, jnp.zeros_like(far),
                      jnp.zeros_like(far), jnp.zeros_like(far),
                      jnp.zeros_like(far), jnp.zeros_like(far)])
    rows = jnp.where(valid[:, :, None], rows, park[None, None, :])
    return rows.transpose(0, 2, 1)          # [C, 8, cap]


def _cell_centers(cl: CellList, dtype):
    """[C, 3] geometric centers of the grid cells (grid-build frame)."""
    nx, ny, nz = _axes3(cl.n_cells)
    c_arr = jnp.arange(nx * ny * nz, dtype=jnp.int32)
    cx = (c_arr // (ny * nz)).astype(dtype)
    rem = c_arr % (ny * nz)
    cy = (rem // nz).astype(dtype)
    cz = (rem % nz).astype(dtype)
    return (jnp.stack([cx, cy, cz], -1) + 0.5) / cl.inv_cell + cl.origin


def neighbor_table(n_cells: int, periodic: bool):
    """[C, 27] int32 stencil cell ids (periodic wrap or -1 pad -> self)."""
    import numpy as np
    g = np.arange(n_cells)
    cx, cy, cz = np.meshgrid(g, g, g, indexing="ij")
    coords = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], -1)  # [C,3]
    offs = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3),
                                indexing="ij"), -1).reshape(27, 3)
    nb = coords[:, None, :] + offs[None, :, :]
    if periodic:
        nb = np.mod(nb, n_cells)
        valid = np.ones(nb.shape[:2], bool)
    else:
        valid = np.all((nb >= 0) & (nb < n_cells), axis=-1)
        nb = np.clip(nb, 0, n_cells - 1)
    cid = (nb[..., 0] * n_cells + nb[..., 1]) * n_cells + nb[..., 2]
    # invalid neighbours point at an all-invalid sentinel: reuse own cell id
    # but mark via the second table
    return (jnp.asarray(cid, jnp.int32),
            jnp.asarray(valid, jnp.int32))


# trunc(x) = erfc(x) + 2x/sqrt(pi) e^{-x^2} as a PURE degree-10 poly in
# x — no exp at all (the exp was ~1/3 of the per-pair VPU cost). Max
# |err| = 6.5e-6 on the whole short-range domain x = r/(2 asmth) in
# [0, 2.25 = RCUT/2], 10x tighter than the old P7*exp form; max |coeff|
# = 1 so f32 Horner evaluation carries no cancellation.
_TRUNC_P10 = (0.999996443, 0.00034025031, -0.00511726609, -0.724873424,
              -0.060829609, 0.480734922, 0.121668214, -0.426925219,
              0.239634766, -0.0574951754, 0.00527855602)


def _grav_fac_nodiv(r, rinv, h, hinv):
    """grav_fac (softened 1/r^3 [G2: forcetree.c constants]) with NO
    divisions: caller supplies rinv (rsqrt) and per-pair hinv = min of
    per-particle inverse softenings."""
    u = r * hinv
    hinv3 = hinv * hinv * hinv
    rinv3 = rinv * rinv * rinv
    h3 = h * h * h
    uinv3 = h3 * rinv3
    inner = hinv3 * (10.666666666667 + u * u * (32.0 * u - 38.4))
    outer = hinv3 * (21.333333333333 - 48.0 * u + 38.4 * u * u
                     - 10.666666666667 * (u * u * u)
                     - 0.066666666667 * uinv3)
    return jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, rinv3))


def _shortrange_trunc_pallas(r, asmth):
    """[G2: shortrange_table] erfc-truncation, Pallas-lowerable form.
    Pure polynomial — valid for x in [0, 2.25] only; callers ALWAYS mask
    with r < rcut (= 4.5 asmth) so out-of-domain values never survive."""
    x = jnp.minimum(r * (0.5 / asmth), 2.25)
    p = jnp.float32(_TRUNC_P10[-1])
    for c in _TRUNC_P10[-2::-1]:
        p = p * x + c
    return p


# erfc(x) as a pure degree-10 poly on [0, 2.25], max |err| 5.2e-7 — the
# potential truncation [G2: pm_periodic.c / potential.c erfc factor]
_ERFC_P10 = (0.999999923, -1.1283663, -0.000326738866, 0.379212313,
             -0.0145173017, -0.0737919465, -0.0643211737, 0.0932881235,
             -0.0418223107, 0.0086528472, -0.000708430614)


def _erfc_trunc_pallas(r, asmth):
    x = jnp.minimum(r * (0.5 / asmth), 2.25)
    p = jnp.float32(_ERFC_P10[-1])
    for c in _ERFC_P10[-2::-1]:
        p = p * x + c
    return p


def _grav_pot_nodiv(r, rinv, h, hinv):
    """Softened potential factor (phi/(G m)); -1/r outside the kernel.
    Division-free twin of ops.softening.grav_pot."""
    u = r * hinv
    uinv = h * rinv
    wp_inner = -2.8 + u * u * (5.333333333333 + u * u * (6.4 * u - 9.6))
    wp_outer = (-3.2 + 0.066666666667 * uinv
                + u * u * (10.666666666667
                           + u * (-16.0 + u * (9.6 - 2.133333333333 * u))))
    return jnp.where(u < 0.5, hinv * wp_inner,
                     jnp.where(u < 1.0, hinv * wp_outer, -rinv))


def _vmem_limit(need_bytes: int) -> int:
    """Scoped-VMEM allowance for kernels whose pairwise temporaries can
    exceed Mosaic's 16 MB default at large cell capacities (SPMD slab
    grids, overflow-driven capacity bumps). ``need_bytes`` is the
    caller's estimate of simultaneously-live pair matrices; clamped
    well inside the 128 MB v5e VMEM so the pipeline keeps headroom."""
    return int(min(100 * 2**20, max(16 * 2**20, need_bytes)))


def _decode_cell(ci, n):
    """Flat cell id -> (cx, cy, cz). ``n`` int (cube) or (nx, ny, nz) —
    anisotropic grids serve the SPMD slab domains (clamped x, periodic
    y/z) with the SAME kernels as the cubic single-chip path."""
    nx, ny, nz = _axes3(n)
    cx = ci // (ny * nz)
    rem = ci % (ny * nz)
    return cx, rem // nz, rem % nz


def _stencil_offsets(j):
    return j // 9 - 1, (j // 3) % 3 - 1, j % 3 - 1


def _nbr_valid_f32(c, j, n_cells, periodic):
    """1.0 where stencil neighbour j of cell c is a real (in-range) cell;
    0.0 where a clamped axis pushed it out of the grid."""
    _, valid = _nbr_cid_traced(c, j, n_cells, periodic)
    return jnp.float32(1.0) if valid is None else valid.astype(jnp.float32)


def _src_index3(ci, j, n_cells, periodic):
    """BlockSpec index_map for the j-th stencil source of target cell ci
    (per-axis wrap/clamp — anisotropic SPMD slab grids included)."""
    cid, _ = _nbr_cid_traced(ci, j, n_cells, periodic)
    return (cid, 0, 0)


def _make_kernel(box, asmth, rcut, periodic, n_cells):
    from gadget_leicester_tpu.ops.softening import grav_fac

    px, py, pz = _axes3(periodic)

    def kernel(tgt_ref, src_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        c = pl.program_id(0)
        valid_nbr = _nbr_valid_f32(c, j, n_cells, periodic)

        t = tgt_ref[0]            # [8, cap]
        s = src_ref[0]
        dx = t[0, :][:, None] - s[0, :][None, :]
        dy = t[1, :][:, None] - s[1, :][None, :]
        dz = t[2, :][:, None] - s[2, :][None, :]
        if px:
            dx = dx - box * jnp.round(dx * (1.0 / box))
        if py:
            dy = dy - box * jnp.round(dy * (1.0 / box))
        if pz:
            dz = dz - box * jnp.round(dz * (1.0 / box))
        r2 = dx * dx + dy * dy + dz * dz
        rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
        r = r2 * rinv
        h = jnp.maximum(t[4, :][:, None], s[4, :][None, :])
        hinv = jnp.minimum(t[6, :][:, None], s[6, :][None, :])
        fac = _grav_fac_nodiv(r, rinv, h, hinv)
        if asmth > 0.0:
            fac = fac * _shortrange_trunc_pallas(r, asmth)
        ok = (r < rcut) & (r > 0.0)
        ok = ok & (s[5, :][None, :] > 0.0)
        w = jnp.where(ok, s[3, :][None, :] * fac, 0.0)
        w = w * jnp.asarray(valid_nbr, w.dtype)
        ax = -jnp.sum(w * dx, axis=1)
        ay = -jnp.sum(w * dy, axis=1)
        az = -jnp.sum(w * dz, axis=1)
        out_ref[0, 0, :] += ax
        out_ref[0, 1, :] += ay
        out_ref[0, 2, :] += az

    return kernel


def _nbr_cid_traced(c, j, n, periodic):
    """Flat cell id of stencil neighbour j of cell c (traced arithmetic).
    ``n``/``periodic`` int/bool or per-axis tuples; returns (cid, valid)
    with valid None when every axis is periodic (all neighbours real)."""
    nv = _axes3(n)
    pv = _axes3(periodic)
    cx, cy, cz = _decode_cell(c, n)
    ox, oy, oz = j // 9 - 1, (j // 3) % 3 - 1, j % 3 - 1
    cs, valid = [], None
    for ck, ok, nk, pk in ((cx, ox, nv[0], pv[0]), (cy, oy, nv[1], pv[1]),
                           (cz, oz, nv[2], pv[2])):
        if pk:
            cs.append((ck + ok) % nk)
        else:
            cs.append(jnp.clip(ck + ok, 0, nk - 1))
            inb = (ck + ok >= 0) & (ck + ok < nk)
            valid = inb if valid is None else (valid & inb)
    return (cs[0] * nv[1] + cs[1]) * nv[2] + cs[2], valid


def _make_kernel_dma(box, asmth, rcut, periodic, n_cells, cap,
                     with_potential=False):
    """Gravity cell-pair kernel, DMA-pipelined + VPU-lean variant:

    * ONE grid step per target cell; 27 stencil sources stream through a
      double-buffered VMEM scratch (guide: Patterns/Double Buffering).
    * NO per-pair minimum-image: the wrap offset of a stencil pair is a
      per-TILE constant (+-box per axis, known from the cell indices), so
      sources are shifted once per tile — 3*cap ops instead of 9*cap^2.
    * single-exp truncation: erfc_poly + 2x/sqrt(pi) share exp(-x^2).
    * direction sums factored through the MXU:
        acc_x_i = -sum_j w_ij (tx_i - sx_j)
                = -tx_i * rowsum(w) + (w @ s_pos)_i
      — one [cap,cap]x[cap,3] matmul replaces 6 full-tile VPU ops.
    """
    def kernel(flag_ref, tgt_ref, src_hbm, out_ref, buf, sems):
        # activity gate [G2: timestep.c individual timesteps — "inactive
        # particles cost nothing"]: tiles with no active targets skip the
        # whole 27-source sweep; the caller restores the frozen acc.
        # flag_ref: scalar-prefetch [C] int32 in SMEM.
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(flag_ref[pl.program_id(0)] > 0)
        def _gated():
            _run_tile(tgt_ref, src_hbm, out_ref, buf, sems)

    def _run_tile(tgt_ref, src_hbm, out_ref, buf, sems):
        c = pl.program_id(0)
        t = tgt_ref[0]
        n = n_cells
        ccx = c // (n * n)
        crem = c % (n * n)
        ccy, ccz = crem // n, crem % n

        def dma(j, slot):
            cid, _ = _nbr_cid_traced(c, j, n_cells, periodic)
            return pltpu.make_async_copy(src_hbm.at[cid], buf.at[slot],
                                         sems.at[slot])

        dma(0, 0).start()

        def body(j, acc):
            ax, ay, az, pw = acc
            slot = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(j + 1 < 27)
            def _():
                dma(j + 1, nxt).start()

            dma(j, slot).wait()
            s = buf[slot]
            if periodic:
                # per-tile wrap shift: source cell (cc+o) out of range on an
                # axis means its particles live box away in absolute coords
                ox, oy, oz = j // 9 - 1, (j // 3) % 3 - 1, j % 3 - 1
                shx = (jnp.where(ccx + ox < 0, -box, 0.0)
                       + jnp.where(ccx + ox >= n, box, 0.0))
                shy = (jnp.where(ccy + oy < 0, -box, 0.0)
                       + jnp.where(ccy + oy >= n, box, 0.0))
                shz = (jnp.where(ccz + oz < 0, -box, 0.0)
                       + jnp.where(ccz + oz >= n, box, 0.0))
            else:
                shx = shy = shz = jnp.float32(0.0)
            sx = s[0, :] + shx
            sy = s[1, :] + shy
            sz = s[2, :] + shz
            dx = t[0, :][:, None] - sx[None, :]
            dy = t[1, :][:, None] - sy[None, :]
            dz = t[2, :][:, None] - sz[None, :]
            r2 = dx * dx + dy * dy + dz * dz
            rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))

            # tile-level softening skip: the force softening h (~2.8 eps)
            # is far below the cell edge, so in uniform regimes no pair in
            # the tile is softened — branch once per tile, not per pair
            # [G2: forcetree.c evaluates the spline per pair regardless].
            hmax = jnp.maximum(jnp.max(t[4, :]), jnp.max(s[4, :]))
            r2min = jnp.min(jnp.where(r2 > 0.0, r2, 1e37))

            def fac_softened(_):
                r = r2 * rinv
                hh = jnp.maximum(t[4, :][:, None], s[4, :][None, :])
                hhinv = jnp.minimum(t[6, :][:, None], s[6, :][None, :])
                fac_ = _grav_fac_nodiv(r, rinv, hh, hhinv)
                if with_potential:
                    return fac_, _grav_pot_nodiv(r, rinv, hh, hhinv)
                return fac_, fac_

            def fac_plain(_):
                rinv3 = rinv * rinv * rinv
                if with_potential:
                    return rinv3, -rinv
                return rinv3, rinv3

            fac, pfac = jax.lax.cond(r2min < hmax * hmax, fac_softened,
                                     fac_plain, operand=None)
            if asmth > 0.0:
                fac = fac * _shortrange_trunc_pallas(r2 * rinv, asmth)
            ok = (r2 < rcut * rcut) & (r2 > 0.0) & (s[5, :][None, :] > 0.0)
            if not periodic:
                _, valid = _nbr_cid_traced(c, j, n_cells, periodic)
                ok = ok & valid
            w = jnp.where(ok, s[3, :][None, :] * fac, 0.0)
            if with_potential:
                if asmth > 0.0:
                    pfac = pfac * _erfc_trunc_pallas(r2 * rinv, asmth)
                wp = jnp.where(ok, s[3, :][None, :] * pfac, 0.0)
                pw = pw + jnp.sum(wp, axis=1)
            # NB: do NOT factor these sums through an MXU matmul — the MXU
            # rounds inputs to bf16 (preferred_element_type only sets the
            # accumulator), which destroys close-pair forces.
            return (ax - jnp.sum(w * dx, axis=1),
                    ay - jnp.sum(w * dy, axis=1),
                    az - jnp.sum(w * dz, axis=1),
                    pw)

        z = jnp.zeros((cap,), t.dtype)
        ax, ay, az, pw = jax.lax.fori_loop(0, 27, body, (z, z, z, z))
        out_ref[0, 0, :] = ax
        out_ref[0, 1, :] = ay
        out_ref[0, 2, :] = az
        if with_potential:
            out_ref[0, 3, :] = pw

    return kernel


def cell_activity_flags(cl: CellList, active):
    """[C] int32: 1 where a cell holds any active particle — the
    tile-skip gate for individual timesteps [G2: timestep.c active list]."""
    idx = jnp.maximum(cl.cells, 0)
    act = (cl.cells >= 0) & active[idx]
    return jnp.any(act, axis=1).astype(jnp.int32)


@partial(hybrid_jit, static_argnames=("box", "n_cells", "capacity", "periodic",
                                   "asmth", "rcut", "with_potential"))
def shortrange_gravity_pallas_dma(
    pos, mass, soft, alive, box: float, n_cells: int, capacity: int = 128,
    asmth: float = 0.0, rcut: float = 1e30, periodic: bool = True,
    active=None, with_potential: bool = False,
):
    """DMA-pipelined variant of shortrange_gravity_pallas (TPU only —
    no interpret mode for manual DMA). With ``active`` (per-particle
    bool), tiles holding no active target skip their sweep and return
    zeros there — callers keep the frozen acc for inactive particles.
    ``with_potential`` adds the erfc-truncated softened potential
    [G2: potential.c] and returns (acc, pot, overflow)."""
    cl = build_cell_list(pos, alive, 0.0, box, n_cells=n_cells,
                         capacity=capacity, periodic=periodic)
    soa = pack_cells_soa(cl, pos, mass, soft, alive)
    c, _, cap = soa.shape
    if active is None:
        flags = jnp.ones((c,), jnp.int32)
    else:
        flags = cell_activity_flags(cl, active)

    out = pl.pallas_call(
        _make_kernel_dma(float(box), asmth, rcut, periodic, n_cells, cap,
                         with_potential=with_potential),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[
                pl.BlockSpec((1, 8, cap), lambda ci, *_: (ci, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, cap), lambda ci, *_: (ci, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 8, cap), soa.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c, 8, cap), soa.dtype),
    )(flags, soa, soa)

    idx = jnp.maximum(cl.cells, 0)
    valid = cl.cells >= 0
    n_p = pos.shape[0]
    flat_idx = jnp.where(valid, idx, n_p).reshape(-1)
    acc = jnp.zeros((n_p + 1, 3), pos.dtype)
    acc = acc.at[flat_idx, 0].set(out[:, 0, :].reshape(-1), mode="drop")
    acc = acc.at[flat_idx, 1].set(out[:, 1, :].reshape(-1), mode="drop")
    acc = acc.at[flat_idx, 2].set(out[:, 2, :].reshape(-1), mode="drop")
    acc_p = jnp.where(alive[:, None], acc[:n_p], 0.0)
    if with_potential:
        pot = jnp.zeros((n_p + 1,), pos.dtype).at[flat_idx].set(
            out[:, 3, :].reshape(-1), mode="drop")
        return acc_p, jnp.where(alive, pot[:n_p], 0.0), cl.overflow
    return acc_p, cl.overflow


def _make_kernel_dma9(box, asmth, rcut, periodic, n_cells, cap,
                      with_potential=False, sparse=False,
                      relative=False):
    """Gravity cell-pair kernel, z-column variant: the 27-cell stencil
    collapses to NINE (dx,dy) columns, each ONE contiguous [8, 3*cap]
    DMA from a z-padded source layout and one [cap, 3*cap] evaluation.
    The 27->9 step reduction attacks the measured bottleneck — per-step
    DMA/loop issue overhead, not per-pair VPU math (bench_sr.py: removing
    the truncation poly changed the time by only 4.5%).

    ``sparse``: the grid runs over a COMPACTED active-tile list — the
    prefetched vector holds real flat cell ids (-1 = padding) instead of
    0/1 flags, and the target block is the i-th compacted tile.

    ``n_cells``/``periodic`` accept per-axis tuples: the SPMD slab
    domains (clamped x, periodic y/z — parallel/spmd.py) run the SAME
    kernel as the cubic single-chip path, with the minimum image applied
    only on periodic axes (slab-frame x is contiguous by construction)."""
    nxc, nyc, nzc = _axes3(n_cells)
    px, py, pz = _axes3(periodic)

    def kernel(flag_ref, tgt_ref, src_hbm, out_ref, buf, sems):
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        if sparse:
            @pl.when(flag_ref[pl.program_id(0)] >= 0)
            def _gated():
                _run(tgt_ref, src_hbm, out_ref, buf, sems,
                     flag_ref[pl.program_id(0)])
        else:
            @pl.when(flag_ref[pl.program_id(0)] > 0)
            def _gated():
                _run(tgt_ref, src_hbm, out_ref, buf, sems, pl.program_id(0))

    def _run(tgt_ref, src_hbm, out_ref, buf, sems, c):
        cx = c // (nyc * nzc)
        rem = c % (nyc * nzc)
        cy, cz = rem // nzc, rem % nzc
        t = tgt_ref[0]

        def dma(j, slot):
            dxo, dyo = j // 3 - 1, j % 3 - 1
            nx_ = ((cx + dxo) % nxc if px
                   else jnp.clip(cx + dxo, 0, nxc - 1))
            ny_ = ((cy + dyo) % nyc if py
                   else jnp.clip(cy + dyo, 0, nyc - 1))
            row = nx_ * nyc + ny_
            return pltpu.make_async_copy(
                src_hbm.at[row, :, pl.ds(cz * cap, 3 * cap)],
                buf.at[slot], sems.at[slot])

        dma(0, 0).start()

        def body(j, acc):
            ax, ay, az, pw = acc
            slot = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(j + 1 < 9)
            def _():
                dma(j + 1, nxt).start()

            dma(j, slot).wait()
            s = buf[slot]
            dxo, dyo = j // 3 - 1, j % 3 - 1
            if relative:
                # CELL-RELATIVE coordinates (pack_cells_soa relative=True,
                # cubic periodic grids only): wrap copies carry identical
                # rel coords, so the stencil geometry is a per-tile /
                # per-lane-third CONSTANT shift (offset * edge) — no
                # per-pair minimum image at all, exact for in-margin
                # stale assignments (rel is wrap-invariant).
                edge = box / n_cells
                ziota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 3 * cap), 1)
                zoff = ((ziota // cap) - 1).astype(t.dtype) * edge
                sx = s[0, :] + dxo.astype(t.dtype) * edge
                sy = s[1, :] + dyo.astype(t.dtype) * edge
                sz = s[2, :] + zoff[0]
                dx = t[0, :][:, None] - sx[None, :]
                dy = t[1, :][:, None] - sy[None, :]
                dz = t[2, :][:, None] - sz[None, :]
            else:
                # per-pair minimum image on PERIODIC axes (not per-tile
                # wrap shifts): stale cached assignments (models.grids)
                # can hold a particle that has drifted across the
                # periodic wrap, where a tile-constant shift would
                # mis-place it by a box length; min-image is
                # shift-invariant mod box so it is exact for any
                # in-margin staleness. Clamped axes (SPMD slab x) are
                # contiguous in the slab frame — plain differences.
                dx = t[0, :][:, None] - s[0, :][None, :]
                dy = t[1, :][:, None] - s[1, :][None, :]
                dz = t[2, :][:, None] - s[2, :][None, :]
                if px:
                    dx = dx - box * jnp.round(dx * (1.0 / box))
                if py:
                    dy = dy - box * jnp.round(dy * (1.0 / box))
                if pz:
                    dz = dz - box * jnp.round(dz * (1.0 / box))
            r2 = dx * dx + dy * dy + dz * dz
            rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))

            hmax = jnp.maximum(jnp.max(t[4, :]), jnp.max(s[4, :]))
            r2min = jnp.min(jnp.where(r2 > 0.0, r2, 1e37))

            def fac_softened(_):
                r = r2 * rinv
                hh = jnp.maximum(t[4, :][:, None], s[4, :][None, :])
                hhinv = jnp.minimum(t[6, :][:, None], s[6, :][None, :])
                fac_ = _grav_fac_nodiv(r, rinv, hh, hhinv)
                if with_potential:
                    return fac_, _grav_pot_nodiv(r, rinv, hh, hhinv)
                return fac_, fac_

            def fac_plain(_):
                rinv3 = rinv * rinv * rinv
                if with_potential:
                    return rinv3, -rinv
                return rinv3, rinv3

            fac, pfac = jax.lax.cond(r2min < hmax * hmax, fac_softened,
                                     fac_plain, operand=None)
            if asmth > 0.0:
                fac = fac * _shortrange_trunc_pallas(r2 * rinv, asmth)
            # no explicit validity term: invalid/padded slots carry m=0
            # (pack_cells_soa / _zpad_columns) and fac is finite
            # everywhere, so m*fac is an exact 0 there
            ok = (r2 < rcut * rcut) & (r2 > 0.0)
            if not (px and py):
                # clamped columns at the x/y edges must not re-count
                inb = True
                if not px:
                    inb = (cx + dxo >= 0) & (cx + dxo < nxc) & inb
                if not py:
                    inb = (cy + dyo >= 0) & (cy + dyo < nyc) & inb
                ok = ok & inb
            w = jnp.where(ok, s[3, :][None, :] * fac, 0.0)
            if with_potential:
                if asmth > 0.0:
                    pfac = pfac * _erfc_trunc_pallas(r2 * rinv, asmth)
                wp = jnp.where(ok, s[3, :][None, :] * pfac, 0.0)
                pw = pw + jnp.sum(wp, axis=1)
            return (ax - jnp.sum(w * dx, axis=1),
                    ay - jnp.sum(w * dy, axis=1),
                    az - jnp.sum(w * dz, axis=1),
                    pw)

        z = jnp.zeros((cap,), t.dtype)
        ax, ay, az, pw = jax.lax.fori_loop(0, 9, body, (z, z, z, z))
        out_ref[0, 0, :] = ax
        out_ref[0, 1, :] = ay
        out_ref[0, 2, :] = az
        if with_potential:
            out_ref[0, 3, :] = pw

    return kernel


def _zpad_columns(soa, n, cap: int, periodic):
    """[C,8,cap] -> z-column layout [nx*ny, 8, (nz+2)*cap]: each (x,y) row
    carries its z-cells contiguously in the lane dim, with wrap copies at
    both ends, so a (dx,dy) stencil column is ONE contiguous DMA.
    ``n``/``periodic`` int/bool or per-axis tuples (z padding follows the
    z-axis periodicity)."""
    nx, ny, nz = _axes3(n)
    pz = _axes3(periodic)[2]
    arr = soa.reshape(nx, ny, nz, 8, cap)
    if pz:
        lo, hi = arr[:, :, -1:], arr[:, :, :1]
    else:
        # non-periodic: dead padding (mass 0, parked positions)
        lo = jnp.zeros_like(arr[:, :, :1]).at[..., :3, :].set(-7e3)
        hi = lo
    arr = jnp.concatenate([lo, arr, hi], axis=2)      # [nx,ny,nz+2,8,cap]
    return arr.transpose(0, 1, 3, 2, 4).reshape(nx * ny, 8, (nz + 2) * cap)


@partial(hybrid_jit, static_argnames=("box", "n_cells", "capacity", "periodic",
                                   "asmth", "rcut", "interpret",
                                   "with_potential", "relative"))
def shortrange_gravity_pallas_dma9(
    pos, mass, soft, alive, box: float, n_cells: int, capacity: int = 128,
    asmth: float = 0.0, rcut: float = 1e30, periodic: bool = True,
    active=None, cl=None, with_potential: bool = False, flags=None,
    interpret: bool = False, soa=None, relative: bool = False,
):
    """Nine-column variant of shortrange_gravity_pallas_dma (TPU only).

    ``cl``: optional prebuilt (possibly STALE, models.grids) cell list —
    pair geometry is per-pair minimum-image so stale assignments within
    the displacement margin are exact. ``with_potential`` adds the
    erfc-truncated softened potential (out row 3) and returns
    (acc, pot, overflow) — the in-step potential feed for sink creation
    and the Stamatellos column [G2: potential.c with PMGRID]."""
    if relative:
        assert isinstance(n_cells, int) and periodic is True, \
            "relative coords need a cubic fully-periodic grid"
    if cl is None:
        cl = build_cell_list(pos, alive, 0.0, box, n_cells=n_cells,
                             capacity=capacity, periodic=periodic)
    with jax.named_scope("sr_pack"):
        if soa is None:
            soa = pack_cells_soa(cl, pos, mass, soft, alive,
                                 active=active if flags is None else None,
                                 relative=relative)
        c, _, cap = soa.shape
        soa_z = _zpad_columns(soa, n_cells, cap, periodic)
        if flags is not None:
            flags = flags.astype(jnp.int32)
        elif active is None:
            flags = jnp.ones((c,), jnp.int32)
        else:
            # tile activity from the packed row 7 — no second [C,cap] gather
            flags = (jnp.max(soa[:, 7, :], axis=1) > 0).astype(jnp.int32)

    out = pl.pallas_call(
        _make_kernel_dma9(float(box), asmth, rcut, periodic, n_cells, cap,
                          with_potential=with_potential,
                          relative=relative),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[
                pl.BlockSpec((1, 8, cap), lambda ci, *_: (ci, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, cap), lambda ci, *_: (ci, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 8, 3 * cap), soa.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c, 8, cap), soa.dtype),
        # ~10 live [cap, 3cap] pair matrices in the kernel body
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(10 * 4 * cap * 3 * cap)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(flags, soa, soa_z)

    with jax.named_scope("sr_merge"):
        # ONE row gather over the inverse slot map instead of per-component
        # scatters (measured 32 ms vs 105 ms at 4.2M)
        from gadget_leicester_tpu.ops.neighbors import merge_rows
        n_p = pos.shape[0]
        k = 4 if with_potential else 3
        res = merge_rows(out, cl, k, n_p)
        acc_p = jnp.where(alive[:, None], res[:, :3], 0.0)
        if with_potential:
            return acc_p, jnp.where(alive, res[:, 3], 0.0), cl.overflow
        return acc_p, cl.overflow


def grav_tile_flags(cl: CellList, active, n_cells: int):
    """[C] int32 tile-activity flags via an O(N) scatter over cell_of —
    cheaper than the [C, cap] gather of cell_activity_flags and usable
    before any pack exists. Stale cached assignments are fine: gating
    only needs to agree with the cells[] the kernel will walk."""
    c = n_cells ** 3
    co = jnp.where(cl.cell_of >= 0, cl.cell_of, c)
    return jnp.zeros((c + 1,), jnp.int32).at[co].max(
        active.astype(jnp.int32), mode="drop")[:c]


# ---------------------------------------------------------------------------
# Cell-compacted active-ENTRY kernels (docs/compact_active_design.md)
# ---------------------------------------------------------------------------
# Target lanes per entry: 8 covers the measured ~2.2 active/cell mean with
# one entry for ~99% of active cells; [lanes, 3cap] slabs are exactly one
# VPU sublane group wide, so lane fill is the only waste.
ENTRY_LANES = 8
def _xyzpad_stencil(soa, n: int, cap: int, periodic):
    """[C,8,cap] -> fully padded stencil layout [(n+2), (n+2), 8, (n+2)cap]:
    wrap (or parked) copies on ALL axes, so the whole 27-cell stencil of
    cell (x,y,z) is ONE strided block .at[x:x+3, y:y+3, :, z*cap:(z+3)*cap]
    — one DMA per active cell instead of nine column DMAs. Pad copies keep
    original coordinates; the kernel's per-pair minimum image makes wrap
    distances exact (and tolerates stale in-margin assignments)."""
    px, py, pz = (periodic,) * 3 if isinstance(periodic, bool) \
        else tuple(periodic)
    arr = soa.reshape(n, n, n, 8, cap)

    def pads(a, axis, per):
        lo_sl = [slice(None)] * a.ndim
        hi_sl = [slice(None)] * a.ndim
        lo_sl[axis] = slice(-1, None)
        hi_sl[axis] = slice(0, 1)
        if per:
            return a[tuple(lo_sl)], a[tuple(hi_sl)]
        dead = jnp.zeros_like(a[tuple(hi_sl)])
        dead = dead.at[..., :3, :].set(-7e3)
        return dead, dead

    lo, hi = pads(arr, 2, pz)
    arr = jnp.concatenate([lo, arr, hi], axis=2)        # [n,n,n+2,8,cap]
    arr = arr.transpose(0, 1, 3, 2, 4).reshape(n, n, 8, (n + 2) * cap)
    lo, hi = pads(arr, 1, py)
    arr = jnp.concatenate([lo, arr, hi], axis=1)        # [n,n+2,8,(n+2)cap]
    lo, hi = pads(arr, 0, px)
    return jnp.concatenate([lo, arr, hi], axis=0)   # [n+2,n+2,8,(n+2)cap]


def count_active_entries(cl: CellList, active, lanes: int):
    """Number of (cell, lane-group) entries the compacted active-entry
    kernels would need: sum over cells of ceil(n_active_in_cell / lanes).
    O(N + C) — cheap enough to run every sync point as the tier gate."""
    c = cl.cells.shape[0]
    co = jnp.where(cl.cell_of >= 0, cl.cell_of, c)
    counts = jnp.zeros((c + 1,), jnp.int32).at[co].add(
        active.astype(jnp.int32), mode="drop")[:c]
    return jnp.sum((counts + lanes - 1) // lanes)


def build_active_entries(cl: CellList, active, lanes: int, k_max: int):
    """Compact the active targets of each cell into entries of ``lanes``
    slots [G2: gravtree.c — the active list IS the work list].

    Returns (entry_cell [k_max] int32, -1 pad;
             entry_slot [k_max, lanes] int32 slot-in-cell, -1 pad;
             total int32 — true entry count, may exceed k_max: caller
             must lax.cond to the dense path then).

    A cell with more than ``lanes`` active targets spills into multiple
    consecutive entries (same cell id, disjoint lane groups) — each entry
    re-reads the cell's stencil, which is the right trade at ~2 active
    targets per cell (measured lcdm_gas activity structure).

    Cost shape: the heavy steps run over the COMPACTED active-slot list
    (<= k_max * lanes, via nonzero over the slot flags — naturally
    cell-grouped because slot order is cell-major), not over [C, cap]:
    the O(C*cap) work is one gather + one cumsum-based nonzero."""
    cells = cl.cells
    c, cap = cells.shape
    kc = k_max * lanes
    act = (cells >= 0) & active[jnp.maximum(cells, 0)]
    # counts/groups per cell via an O(C*cap->C) row reduction (cheap);
    # total never truncates even when the compact list would
    n_act = jnp.sum(act.astype(jnp.int32), axis=1)            # [C]
    groups = (n_act + lanes - 1) // lanes
    base = jnp.cumsum(groups) - groups                        # [C]
    total = jnp.sum(groups)
    # compacted active slots, ascending = grouped by cell. When
    # total <= k_max, actives <= total*lanes <= kc, so nothing is lost;
    # otherwise the caller must take the dense path anyway.
    flat = jnp.nonzero(act.reshape(-1), size=kc, fill_value=-1)[0]
    valid = flat >= 0
    fc = jnp.where(valid, flat // cap, c)                     # cell per slot
    fs = jnp.where(valid, flat % cap, 0)                      # slot-in-cell
    i_arr = jnp.arange(kc, dtype=jnp.int32)
    newseg = jnp.concatenate([jnp.ones((1,), bool), fc[1:] != fc[:-1]])
    first = jax.lax.cummax(jnp.where(newseg, i_arr, 0))
    rank = i_arr - first                                      # rank in cell
    gid = base[jnp.minimum(fc, c - 1)] + rank // lanes
    gid_s = jnp.where(valid, jnp.minimum(gid, k_max), k_max)
    lane = rank % lanes
    entry_cell = jnp.full((k_max + 1,), -1, jnp.int32).at[gid_s].max(
        fc.astype(jnp.int32), mode="drop")[:k_max]
    entry_slot = jnp.full((k_max + 1, lanes), -1, jnp.int32).at[
        gid_s, lane].set(fs.astype(jnp.int32), mode="drop")[:k_max]
    return entry_cell, entry_slot, total


# entries evaluated per kernel grid step: amortizes the per-step loop /
# output-pipeline overhead and makes padding-tail steps E flag checks
ENTRIES_PER_BLOCK = 8


def _make_kernel_entries(box, asmth, rcut, periodic, n_cells, cap, lanes,
                         with_potential=False, relative=False):
    """Gravity kernel over compacted active ENTRIES: each grid step
    evaluates ENTRIES_PER_BLOCK entries; each entry is <= ``lanes``
    active targets of one cell against the full 27-cell stencil, fetched
    as ONE strided DMA from the _xyzpad_stencil layout and
    double-buffered across the flat entry sequence (the next entry's
    stencil streams in while this one computes).

    Per-entry cost: one DMA of [3,3,8,3cap] + 9 x [lanes, 3cap] VPU
    slabs — lanes/cap of the dense tile's arithmetic. Padding entries
    (cell -1) start no DMA and write only zeros."""
    E = ENTRIES_PER_BLOCK

    def dma_for(ecell_ref, src_hbm, buf, sems, e, slot):
        cc = jnp.maximum(ecell_ref[e], 0)
        n = n_cells
        x = cc // (n * n)
        rem = cc % (n * n)
        y, z = rem // n, rem % n
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(x, 3), pl.ds(y, 3), :,
                       pl.ds(z * cap, 3 * cap)],
            buf.at[slot], sems.at[slot])

    def kernel(ecell_ref, tgt_ref, src_hbm, out_ref, buf, sems):
        i = pl.program_id(0)
        k_max = pl.num_programs(0) * E
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        base = i * E

        @pl.when((i == 0) & (ecell_ref[0] >= 0))
        def _():
            dma_for(ecell_ref, src_hbm, buf, sems, 0, 0).start()

        def entry(e, _):
            j = base + e
            nxt = jnp.minimum(j + 1, k_max - 1)

            @pl.when((j + 1 < k_max) & (ecell_ref[nxt] >= 0))
            def _():
                dma_for(ecell_ref, src_hbm, buf, sems, nxt,
                        jax.lax.rem(j + 1, 2)).start()

            @pl.when(ecell_ref[j] >= 0)
            def _compute():
                slot = jax.lax.rem(j, 2)
                dma_for(ecell_ref, src_hbm, buf, sems, j, slot).wait()
                t = tgt_ref[e]                  # [8, 128]; lanes used
                tx = t[0, :lanes]
                ty = t[1, :lanes]
                tz = t[2, :lanes]
                tsoft = t[4, :lanes]
                tsinv = t[6, :lanes]

                def body(jj, acc):
                    ax, ay, az, pw = acc
                    s = buf[slot, jj // 3, jj % 3]    # [8, 3cap]
                    if relative:
                        # cell-relative coords: constant stencil shifts
                        # (see _make_kernel_dma9)
                        edge = box / n_cells
                        ziota = jax.lax.broadcasted_iota(
                            jnp.int32, (1, 3 * cap), 1)
                        zoff = ((ziota // cap) - 1).astype(
                            s.dtype) * edge
                        sx = s[0, :] + (jj // 3 - 1).astype(s.dtype) * edge
                        sy = s[1, :] + (jj % 3 - 1).astype(s.dtype) * edge
                        sz = s[2, :] + zoff[0]
                        dx = tx[:, None] - sx[None, :]
                        dy = ty[:, None] - sy[None, :]
                        dz = tz[:, None] - sz[None, :]
                    else:
                        dx = tx[:, None] - s[0, :][None, :]
                        dy = ty[:, None] - s[1, :][None, :]
                        dz = tz[:, None] - s[2, :][None, :]
                        if periodic:
                            dx = dx - box * jnp.round(dx * (1.0 / box))
                            dy = dy - box * jnp.round(dy * (1.0 / box))
                            dz = dz - box * jnp.round(dz * (1.0 / box))
                    r2 = dx * dx + dy * dy + dz * dz
                    rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
                    r = r2 * rinv
                    hh = jnp.maximum(tsoft[:, None], s[4, :][None, :])
                    hhinv = jnp.minimum(tsinv[:, None], s[6, :][None, :])
                    fac = _grav_fac_nodiv(r, rinv, hh, hhinv)
                    if with_potential:
                        pfac = _grav_pot_nodiv(r, rinv, hh, hhinv)
                    if asmth > 0.0:
                        fac = fac * _shortrange_trunc_pallas(r, asmth)
                    ok = (r2 < rcut * rcut) & (r2 > 0.0)
                    w = jnp.where(ok, s[3, :][None, :] * fac, 0.0)
                    if with_potential:
                        if asmth > 0.0:
                            pfac = pfac * _erfc_trunc_pallas(r, asmth)
                        wp = jnp.where(ok, s[3, :][None, :] * pfac, 0.0)
                        pw = pw + jnp.sum(wp, axis=1)
                    return (ax - jnp.sum(w * dx, axis=1),
                            ay - jnp.sum(w * dy, axis=1),
                            az - jnp.sum(w * dz, axis=1),
                            pw)

                z0 = jnp.zeros((lanes,), t.dtype)
                ax, ay, az, pw = jax.lax.fori_loop(0, 9, body,
                                                   (z0, z0, z0, z0))
                out_ref[e, 0, :lanes] = ax
                out_ref[e, 1, :lanes] = ay
                out_ref[e, 2, :lanes] = az
                if with_potential:
                    out_ref[e, 3, :lanes] = pw

            return 0

        jax.lax.fori_loop(0, E, entry, 0)

    return kernel


def shortrange_gravity_pallas_entries(
    pos, mass, soft, alive, box: float, n_cells: int, capacity: int,
    asmth: float, rcut: float, entry_cell, entry_slot, cl: CellList,
    periodic: bool = True, with_potential: bool = False,
    interpret: bool = False, soa=None, relative: bool = False,
):
    """Active-entry short-range gravity (docs/compact_active_design.md):
    O(entries) kernel work at nearly-idle sync points — the TPU shape of
    [G2: gravtree.c walking only the active list]. ``entry_cell`` /
    ``entry_slot`` from build_active_entries (caller guarantees
    total <= k_max via lax.cond to the dense path). Inactive particles'
    rows come back 0 — callers keep frozen values, as everywhere."""
    k_max, lanes = entry_slot.shape
    cap = capacity
    n_p = pos.shape[0]

    if relative:
        assert isinstance(n_cells, int) and periodic is True, \
            "relative coords need a cubic fully-periodic grid"
    with jax.named_scope("sr_entries_pack"):
        if soa is None:
            soa = pack_cells_soa(cl, pos, mass, soft, alive,
                                 relative=relative)
        soa_x = _xyzpad_stencil(soa, n_cells, cap, periodic)

        ec = jnp.maximum(entry_cell, 0)
        es = jnp.maximum(entry_slot, 0)
        pidx = cl.cells[ec[:, None], es]                  # [k_max, lanes]
        valid = (entry_cell[:, None] >= 0) & (entry_slot >= 0) & (pidx >= 0)
        pidx = jnp.where(valid, pidx, 0)
        soft_inv = jnp.where(soft > 0, 1.0 / soft, 0.0)
        table = jnp.stack(
            [pos[:, 0], pos[:, 1], pos[:, 2], mass, soft,
             jnp.ones_like(mass), soft_inv, jnp.zeros_like(mass)], axis=1)
        rows = table[pidx]                                # [k_max, lanes, 8]
        if relative:
            # targets relative to THEIR entry's cell center (matches the
            # relative source pack; min-image handles wrapped drifters)
            centers = _cell_centers(cl, pos.dtype)[ec]    # [k_max, 3]
            relp = rows[:, :, :3] - centers[:, None, :]
            relp = relp - box * jnp.round(relp * (1.0 / box))
            rows = jnp.concatenate([relp, rows[:, :, 3:]], axis=-1)
        far = -7.0 / cl.inv_cell[0]
        park = jnp.stack([far, far, far, jnp.zeros_like(far),
                          jnp.zeros_like(far), jnp.zeros_like(far),
                          jnp.zeros_like(far), jnp.zeros_like(far)])
        rows = jnp.where(valid[:, :, None], rows, park[None, None, :])
        tgt = jnp.zeros((k_max, 8, 128), pos.dtype)
        tgt = tgt.at[:, :, :lanes].set(rows.transpose(0, 2, 1))

    e_blk = ENTRIES_PER_BLOCK
    k_pad = ((k_max + e_blk - 1) // e_blk) * e_blk
    if k_pad != k_max:
        entry_cell = jnp.concatenate(
            [entry_cell, jnp.full((k_pad - k_max,), -1, jnp.int32)])
        tgt = jnp.concatenate(
            [tgt, jnp.zeros((k_pad - k_max, 8, 128), tgt.dtype)])
    out = pl.pallas_call(
        _make_kernel_entries(float(box), asmth, rcut, periodic, n_cells,
                             cap, lanes, with_potential=with_potential,
                             relative=relative),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(k_pad // e_blk,),
            in_specs=[
                pl.BlockSpec((e_blk, 8, 128), lambda bi, *_: (bi, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((e_blk, 8, 128),
                                   lambda bi, *_: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 3, 3, 8, 3 * cap), soa.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, 8, 128), soa.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(entry_cell, tgt, soa_x)
    out = out[:k_max]

    with jax.named_scope("sr_entries_merge"):
        fidx = jnp.where(valid, pidx, n_p).reshape(-1)
        lout = out[:, :, :lanes]
        acc = jnp.zeros((n_p + 1, 3), pos.dtype)
        acc = acc.at[fidx, 0].set(lout[:, 0, :].reshape(-1), mode="drop")
        acc = acc.at[fidx, 1].set(lout[:, 1, :].reshape(-1), mode="drop")
        acc = acc.at[fidx, 2].set(lout[:, 2, :].reshape(-1), mode="drop")
        acc_p = jnp.where(alive[:, None], acc[:n_p], 0.0)
        if with_potential:
            pot = jnp.zeros((n_p + 1,), pos.dtype).at[fidx].set(
                lout[:, 3, :].reshape(-1), mode="drop")
            return acc_p, jnp.where(alive, pot[:n_p], 0.0), cl.overflow
        return acc_p, cl.overflow


# ---------------------------------------------------------------------------
# SPH density + hydro cell-pair kernels
# ---------------------------------------------------------------------------
def pack_sph_soa(cl: CellList, pos, vel, mass, hsml, gas_mask, needed=None,
                 centers=None, wrap=None):
    """[C, 8, cap] rows = x, y, z, m, vx, vy, vz, h (invalid: m=0,
    parked). One [N,8]-row gather + transpose (see pack_cells_soa).
    ``needed`` [C] bool gates the gather per tile (see pack_cells_soa).

    ``centers`` [C, 3]: store BLOCK-RELATIVE positions (pos - center,
    minimum-imaged mod ``wrap`` when given) — consumers then apply
    constant stencil shifts instead of per-pair minimum image (see
    pack_cells_soa relative=...)."""
    idx = jnp.maximum(cl.cells, 0)
    valid = (cl.cells >= 0) & gas_mask[idx]
    if needed is not None:
        valid = valid & needed[:, None]
        idx = jnp.where(needed[:, None], idx, 0)
    table = jnp.stack([pos[:, 0], pos[:, 1], pos[:, 2], mass,
                       vel[:, 0], vel[:, 1], vel[:, 2], hsml], axis=1)
    rows = table[idx]                       # [C, cap, 8]
    if centers is not None:
        rel = rows[:, :, :3] - centers[:, None, :]
        if wrap is not None:
            rel = rel - wrap * jnp.round(rel / wrap)
        rows = jnp.concatenate([rel, rows[:, :, 3:]], axis=-1)
    far = jnp.asarray(-7.0, pos.dtype) / cl.inv_cell[0]
    z0 = jnp.zeros_like(far)
    park = jnp.stack([far, far, far, z0, z0, z0, z0, z0 + 1.0])
    rows = jnp.where(valid[:, :, None], rows, park[None, None, :])
    return rows.transpose(0, 2, 1)          # [C, 8, cap]


def _pair_geometry(t, s, box, periodic):
    """Returns (dx, dy, dz, r, rinv) — rinv via rsqrt (no division);
    rinv is large-but-finite at r=0 and every user multiplies it by a
    factor that is exactly 0 there. ``periodic`` bool or per-axis tuple
    (minimum image only on periodic axes)."""
    px, py, pz = _axes3(periodic)
    dx = t[0, :][:, None] - s[0, :][None, :]
    dy = t[1, :][:, None] - s[1, :][None, :]
    dz = t[2, :][:, None] - s[2, :][None, :]
    if px:
        dx = dx - box * jnp.round(dx * (1.0 / box))
    if py:
        dy = dy - box * jnp.round(dy * (1.0 / box))
    if pz:
        dz = dz - box * jnp.round(dz * (1.0 / box))
    r2 = dx * dx + dy * dy + dz * dz
    rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
    return dx, dy, dz, r2 * rinv, rinv


def _make_density_kernel(box, periodic, n_cells):
    from gadget_leicester_tpu.ops.sph_kernels import (kernel_dw_dr,
                                                      kernel_w_and_dwdh)

    def kernel(tgt_ref, src_ref, h_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        vnb = _nbr_valid_f32(pl.program_id(0), j, n_cells, periodic)

        t = tgt_ref[0]
        s = src_ref[0]
        dx, dy, dz, r, rinv = _pair_geometry(t, s, box, periodic)
        ht = h_ref[0, 0, :][:, None]
        w, dwdh = kernel_w_and_dwdh(r, ht)
        dwdr = kernel_dw_dr(r, ht)
        m = s[3, :][None, :] * vnb
        rho = jnp.sum(m * w, axis=1)
        drhodh = jnp.sum(m * dwdh, axis=1)
        fac = m * dwdr * rinv  # dwdr(r=0) == 0 exactly; rinv finite
        dvx = t[4, :][:, None] - s[4, :][None, :]
        dvy = t[5, :][:, None] - s[5, :][None, :]
        dvz = t[6, :][:, None] - s[6, :][None, :]
        vdotr = dvx * dx + dvy * dy + dvz * dz
        divv = -jnp.sum(fac * vdotr, axis=1)
        # rot = sum fac * (dv x dx)
        rx = jnp.sum(fac * (dvy * dz - dvz * dy), axis=1)
        ry = jnp.sum(fac * (dvz * dx - dvx * dz), axis=1)
        rz = jnp.sum(fac * (dvx * dy - dvy * dx), axis=1)
        out_ref[0, 0, :] += rho
        out_ref[0, 1, :] += drhodh
        out_ref[0, 2, :] += divv
        out_ref[0, 3, :] += rx
        out_ref[0, 4, :] += ry
        out_ref[0, 5, :] += rz

    return kernel


def _make_density_kernel_dma(box, periodic, n_cells, cap):
    """Density sweep, DMA-streamed: one grid step per target cell, stencil
    sources double-buffered, per-tile wrap shift, accumulators carried in
    registers (single output write). ``n_cells``/``periodic`` accept
    per-axis tuples (SPMD slab grids)."""
    from gadget_leicester_tpu.ops.sph_kernels import (kernel_dw_dr,
                                                      kernel_w_and_dwdh)
    nxc, nyc, nzc = _axes3(n_cells)
    px, py, pz = _axes3(periodic)

    def kernel(tgt_ref, h_ref, src_hbm, out_ref, buf, sems):
        c = pl.program_id(0)
        t = tgt_ref[0]
        ht = h_ref[0, 0, :][:, None]
        ccx = c // (nyc * nzc)
        crem = c % (nyc * nzc)
        ccy, ccz = crem // nzc, crem % nzc

        def dma(j, slot):
            cid, _ = _nbr_cid_traced(c, j, n_cells, periodic)
            return pltpu.make_async_copy(src_hbm.at[cid], buf.at[slot],
                                         sems.at[slot])

        dma(0, 0).start()

        def body(j, acc):
            rho, drhodh, divv, rx, ry, rz = acc
            slot = jax.lax.rem(j, 2)
            nxt = jax.lax.rem(j + 1, 2)

            @pl.when(j + 1 < 27)
            def _():
                dma(j + 1, nxt).start()

            dma(j, slot).wait()
            s = buf[slot]
            ox, oy, oz = j // 9 - 1, (j // 3) % 3 - 1, j % 3 - 1

            def axis(cc, o, nk, pk):
                # periodic axis: per-tile wrap shift, always valid;
                # clamped axis: no shift, out-of-range tiles masked out
                if pk:
                    sh = (jnp.where(cc + o < 0, -box, 0.0)
                          + jnp.where(cc + o >= nk, box, 0.0))
                    return sh, True
                return jnp.float32(0.0), (cc + o >= 0) & (cc + o < nk)

            shx, vx = axis(ccx, ox, nxc, px)
            shy, vy = axis(ccy, oy, nyc, py)
            shz, vz = axis(ccz, oz, nzc, pz)
            inb = vx & vy & vz
            vnb = (jnp.float32(1.0) if inb is True
                   else jnp.asarray(inb).astype(jnp.float32))
            dx = t[0, :][:, None] - (s[0, :] + shx)[None, :]
            dy = t[1, :][:, None] - (s[1, :] + shy)[None, :]
            dz = t[2, :][:, None] - (s[2, :] + shz)[None, :]
            r2 = dx * dx + dy * dy + dz * dz
            rinv = jax.lax.rsqrt(jnp.maximum(r2, 1e-37))
            r = r2 * rinv
            w, dwdh = kernel_w_and_dwdh(r, ht)
            dwdr = kernel_dw_dr(r, ht)
            m = s[3, :][None, :] * vnb
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

        z = jnp.zeros((cap,), jnp.float32)
        rho, drhodh, divv, rx, ry, rz = jax.lax.fori_loop(
            0, 27, body, (z, z, z, z, z, z))
        out_ref[0, 0, :] = rho
        out_ref[0, 1, :] = drhodh
        out_ref[0, 2, :] = divv
        out_ref[0, 3, :] = rx
        out_ref[0, 4, :] = ry
        out_ref[0, 5, :] = rz
        out_ref[0, 6:, :] = jnp.zeros((2, cap), jnp.float32)

    return kernel


def density_sums_pallas_dma(cl: CellList, soa, h_slots, box: float,
                            n_cells: int):
    """DMA-streamed density sweep (TPU only; same outputs as
    density_sums_pallas)."""
    c, _, cap = soa.shape
    return pl.pallas_call(
        _make_density_kernel_dma(float(box), cl.periodic, n_cells, cap),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda ci: (ci, 0, 0)),
            pl.BlockSpec((1, 1, cap), lambda ci: (ci, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, cap), lambda ci: (ci, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((c, 8, cap), soa.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 8, cap), soa.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # ~24 live [cap, cap] pair matrices (W/dW evals + accumulators)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(24 * 4 * cap * cap)),
    )(soa, h_slots.reshape(c, 1, cap), soa)


def density_sums_pallas(cl: CellList, soa, h_slots, box: float,
                        n_cells: int, interpret: bool = False):
    """Per-cell density sweep: returns [C, 8, cap] rows rho, drho_dh,
    divv_raw, rot_raw(3). `soa` from pack_sph_soa (static rows);
    h_slots [C, cap] is the per-slot smoothing length (separate input so
    the adaptive loop never rebuilds the 8-row SoA)."""
    c, _, cap = soa.shape
    n = n_cells
    periodic = cl.periodic

    def src_index(ci, j):
        return _src_index3(ci, j, n, periodic)

    grid_spec = pl.GridSpec(
        grid=(c, 27),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
            pl.BlockSpec((1, 8, cap), src_index),
            pl.BlockSpec((1, 1, cap), lambda ci, j: (ci, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
    )
    return pl.pallas_call(
        _make_density_kernel(float(box), periodic, n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, 8, cap), soa.dtype),
        interpret=interpret,
    )(soa, soa, h_slots.reshape(c, 1, cap))


def _make_hydro_kernel(box, periodic, n_cells, visc_const):
    from gadget_leicester_tpu.ops.sph_kernels import kernel_dw_dr

    def kernel(params_ref, tgt_a, tgt_b, src_a, src_b, out_ref):
        # params (SMEM): [hubble_a2_flow, fac_mu] — traced comoving factors
        hubble_a2_flow = params_ref[0, 0]
        fac_mu = params_ref[0, 1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        vnb = _nbr_valid_f32(pl.program_id(0), j, n_cells, periodic)

        ta, tb = tgt_a[0], tgt_b[0]
        sa, sb = src_a[0], src_b[0]
        dx, dy, dz, r, rinv = _pair_geometry(ta, sa, box, periodic)
        ht = ta[7, :][:, None]
        hs = sa[7, :][None, :]
        inside = (r < jnp.maximum(ht, hs)) & (r > 0.0)
        inside = inside & (sb[4, :][None, :] > 0.0)   # src valid row
        dwk_i = kernel_dw_dr(r, ht)
        dwk_j = kernel_dw_dr(r, hs)
        dvx = ta[4, :][:, None] - sa[4, :][None, :]
        dvy = ta[5, :][:, None] - sa[5, :][None, :]
        dvz = ta[6, :][:, None] - sa[6, :][None, :]
        r2 = r * r
        vdotr2 = dvx * dx + dvy * dy + dvz * dz + hubble_a2_flow * r2
        approaching = vdotr2 < 0.0
        mu_ij = fac_mu * vdotr2 * rinv
        vsig = tb[2, :][:, None] + sb[2, :][None, :] \
            - 3.0 * jnp.where(approaching, mu_ij, 0.0)
        rho_ij = 0.5 * (tb[0, :][:, None] + sb[0, :][None, :])
        rs = jax.lax.rsqrt(jnp.maximum(rho_ij, 1e-37))
        rho_ij_inv = rs * rs              # 1/x without a division
        f_ij = 0.5 * (tb[3, :][:, None] + sb[3, :][None, :])
        visc = jnp.where(approaching,
                         0.5 * visc_const * vsig * (-mu_ij) * rho_ij_inv * f_ij,
                         0.0)
        m = sa[3, :][None, :]
        hfc_visc = 0.5 * m * visc * (dwk_i + dwk_j) * rinv
        hfc = hfc_visc + m * (tb[1, :][:, None] * dwk_i
                              + sb[1, :][None, :] * dwk_j) * rinv
        mask = jnp.where(inside, vnb, 0.0)
        hfc = hfc * mask
        hfc_visc = hfc_visc * mask
        out_ref[0, 0, :] += -jnp.sum(hfc * dx, axis=1)
        out_ref[0, 1, :] += -jnp.sum(hfc * dy, axis=1)
        out_ref[0, 2, :] += -jnp.sum(hfc * dz, axis=1)
        out_ref[0, 3, :] += 0.5 * jnp.sum(hfc_visc * vdotr2, axis=1)
        msv = jnp.max(jnp.where(mask > 0, vsig, 0.0), axis=1)
        out_ref[0, 4, :] = jnp.maximum(out_ref[0, 4, :], msv)

    return kernel


def hydro_sums_pallas(cl: CellList, soa_a, soa_b, box: float, n_cells: int,
                      visc_const: float, hubble_a2_flow: float,
                      fac_mu: float, interpret: bool = False):
    """Per-cell hydro sweep. soa_a rows: x,y,z,m,vx,vy,vz,h;
    soa_b rows: rho, p_over_rho2*f, c_snd, balsara, valid, 0,0,0.
    Output rows: ax, ay, az, dt_ent_raw, max_signal_vel."""
    c, _, cap = soa_a.shape
    n = n_cells
    periodic = cl.periodic

    def src_index(ci, j):
        return _src_index3(ci, j, n, periodic)

    params = jnp.stack([jnp.asarray(hubble_a2_flow, soa_a.dtype),
                        jnp.asarray(fac_mu, soa_a.dtype)]).reshape(1, 2)
    grid_spec = pl.GridSpec(
        grid=(c, 27),
        in_specs=[
            pl.BlockSpec((1, 2), lambda ci, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
            pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
            pl.BlockSpec((1, 8, cap), src_index),
            pl.BlockSpec((1, 8, cap), src_index),
        ],
        out_specs=pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
    )
    return pl.pallas_call(
        _make_hydro_kernel(float(box), periodic, n, float(visc_const)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, 8, cap), soa_a.dtype),
        # ~28 live [cap, cap] pair matrices in the hydro body
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(28 * 4 * cap * cap)),
        interpret=interpret,
    )(params, soa_a, soa_b, soa_a, soa_b)


def density_adaptive_pallas(
    pos, vel, mass, hsml0, gas_mask,
    des_num_ngb: float, max_dev: float,
    box: float, n_cells: int, capacity: int = 128,
    min_hsml: float = 0.0, max_hsml=None,
    periodic: bool = True, max_iters: int = 40,
    origin=0.0, extent=None, interpret: bool = False,
    n_targets: int | None = None, cl: CellList | None = None,
):
    """Adaptive-h density solve on the Pallas sweep (API mirrors
    ops.sph_cells.density_adaptive_cells; returns (DensityResult, CellList)).

    The Newton/bisection iteration runs ENTIRELY in cell-slot space
    [C*cap]: per sweep the only data movement is the h-slot input and the
    kernel output — no per-iteration particle gathers/scatters (those cost
    more than the kernel at production sizes). Particle-space fields are
    produced by one scatter set at the end.

    ``n_targets``: only rows < n_targets iterate/converge and appear in
    the outputs (sized n_targets); later rows (SPMD slab ghosts) source
    the sums but are never targets. ``cl``: optional prebuilt cell list
    (anisotropic SPMD grids pass theirs; must match origin/extent).
    """
    from gadget_leicester_tpu.ops.sph_dense import (DensityResult,
                                                    density_adaptive_generic)

    extent = box if extent is None else extent
    if cl is None:
        cl = build_cell_list(pos, gas_mask, origin, extent, n_cells=n_cells,
                             capacity=capacity, periodic=periodic)
    ng = pos.shape[0]
    nt = ng if n_targets is None else n_targets
    c, cap = cl.cells.shape

    base_soa = pack_sph_soa(cl, pos, vel, mass,
                            jnp.ones(ng, pos.dtype), gas_mask)
    idx = jnp.maximum(cl.cells, 0)
    valid = (cl.cells >= 0) & gas_mask[idx]
    tgt_valid = valid & (idx < nt) if nt != ng else valid
    mass_slots = base_soa[:, 3, :].reshape(-1)
    mask_slots = tgt_valid.reshape(-1)
    h0_slots = jnp.where(valid, hsml0[idx], 1.0).reshape(-1)

    def sweep(h_slots):
        if interpret:
            out = density_sums_pallas(cl, base_soa, h_slots.reshape(c, cap),
                                      box, n_cells, interpret=True)
        else:
            out = density_sums_pallas_dma(cl, base_soa,
                                          h_slots.reshape(c, cap),
                                          box, n_cells)
        rho = out[:, 0, :].reshape(-1)
        drhodh = out[:, 1, :].reshape(-1)
        divv = out[:, 2, :].reshape(-1)
        rot = jnp.stack([out[:, 3, :].reshape(-1), out[:, 4, :].reshape(-1),
                         out[:, 5, :].reshape(-1)], axis=-1)
        return rho, drhodh, divv, rot

    res_slots = density_adaptive_generic(
        sweep, mass_slots, h0_slots, mask_slots, des_num_ngb, max_dev,
        min_hsml=min_hsml, max_hsml=max_hsml, max_iters=max_iters)

    # slot space -> particle space (single scatter per field; ghost
    # slots — idx >= n_targets — are dropped)
    flat_idx = jnp.where(mask_slots, idx.reshape(-1), nt)

    def to_part(x_slots, fill=0.0):
        return jnp.full((nt + 1,), fill, x_slots.dtype).at[flat_idx].set(
            x_slots, mode="drop")[:nt]

    res = DensityResult(
        rho=to_part(res_slots.rho),
        dhsml_factor=to_part(res_slots.dhsml_factor, 1.0),
        div_vel=to_part(res_slots.div_vel),
        curl_vel=to_part(res_slots.curl_vel),
        num_ngb_eff=to_part(res_slots.num_ngb_eff),
        hsml=to_part(res_slots.hsml, 1.0),
        iters=res_slots.iters,
    )
    return res, cl


def hydro_force_pallas(
    cl: CellList, pos, vel, mass, hsml, rho, pressure, dhsml_factor,
    div_vel, curl_vel, gas_mask, visc_const: float,
    box: float, n_cells: int,
    hubble_a2_flow=0.0, hubble_a2_norm=1.0, fac_mu=1.0,
    interpret: bool = False, n_targets: int | None = None,
):
    """Entropy-form hydro force on the Pallas sweep (API mirrors
    ops.sph_cells.hydro_force_cells; cl from density_adaptive_pallas).
    ``n_targets``: outputs sized n_targets; rows beyond it (SPMD ghosts)
    source the pair sums only."""
    from gadget_leicester_tpu.core.config import GAMMA, GAMMA_MINUS1
    from gadget_leicester_tpu.ops.sph_dense import HydroResult

    ng = pos.shape[0] if n_targets is None else n_targets
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    c_snd = jnp.sqrt(GAMMA * pressure / rho_safe)
    p_over_rho2 = pressure / rho_safe**2 * dhsml_factor
    h_safe = jnp.where(hsml > 0, hsml, 1.0)
    balsara = jnp.abs(div_vel) / (
        jnp.abs(div_vel) + curl_vel + 1e-4 * c_snd / h_safe / fac_mu)

    soa_a = pack_sph_soa(cl, pos, vel, mass, hsml, gas_mask)
    idx = jnp.maximum(cl.cells, 0)
    valid = ((cl.cells >= 0) & gas_mask[idx]).astype(pos.dtype)
    zero = jnp.zeros_like(valid)
    soa_b = jnp.stack([rho[idx], p_over_rho2[idx], c_snd[idx],
                       balsara[idx], valid, zero, zero, zero], axis=1)

    out = hydro_sums_pallas(cl, soa_a, soa_b, box, n_cells, visc_const,
                            hubble_a2_flow, fac_mu, interpret=interpret)
    ax, ay, az, dt_raw, msv = scatter_cell_rows(cl, out, ng,
                                                rows=(0, 1, 2, 3, 4))
    acc = jnp.stack([ax, ay, az], axis=-1)
    dt_ent = dt_raw * GAMMA_MINUS1 / (
        jnp.asarray(hubble_a2_norm, rho.dtype)
        * rho_safe[:ng]**GAMMA_MINUS1)
    gm = gas_mask[:ng]
    return HydroResult(
        acc=jnp.where(gm[:, None], acc, 0.0),
        dt_entropy=jnp.where(gm, dt_ent, 0.0),
        max_signal_vel=jnp.where(gm, msv, 0.0),
    )


def scatter_cell_rows(cl: CellList, out, n_particles: int, rows,
                      needed=None):
    """[C,8,cap] kernel output -> per-particle arrays for `rows` indices.
    ``needed`` [C] bool drops whole tiles from the scatter (gated tiles
    produced no output; their particles keep frozen values upstream)."""
    keep = cl.cells >= 0
    if needed is not None:
        keep = keep & needed[:, None]
    idx = jnp.where(keep, jnp.maximum(cl.cells, 0),
                    n_particles).reshape(-1)
    results = []
    for r in rows:
        flat = out[:, r, :].reshape(-1)
        arr = jnp.zeros((n_particles + 1,), out.dtype).at[idx].set(
            flat, mode="drop")[:n_particles]
        results.append(arr)
    return results


@partial(hybrid_jit, static_argnames=("box", "n_cells", "capacity", "periodic",
                                   "asmth", "rcut", "interpret"))
def shortrange_gravity_pallas(
    pos,
    mass,
    soft,
    alive,
    box: float,
    n_cells: int,
    capacity: int = 128,
    asmth: float = 0.0,
    rcut: float = 1e30,
    periodic: bool = True,
    interpret: bool = False,
):
    """acc[N,3] (no G factor) via the Pallas cell-pair kernel."""
    cl = build_cell_list(pos, alive, 0.0, box, n_cells=n_cells,
                         capacity=capacity, periodic=periodic)
    soa = pack_cells_soa(cl, pos, mass, soft, alive)
    c, _, cap = soa.shape
    n = n_cells

    def src_index(ci, j):
        # neighbour cell id from pure grid-index arithmetic (no SMEM tables)
        return _src_index3(ci, j, n, periodic)

    grid_spec = pl.GridSpec(
        grid=(c, 27),
        in_specs=[
            pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
            pl.BlockSpec((1, 8, cap), src_index),
        ],
        out_specs=pl.BlockSpec((1, 8, cap), lambda ci, j: (ci, 0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(box, asmth, rcut, periodic, n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, 8, cap), soa.dtype),
        interpret=interpret,
    )(soa, soa)

    # scatter per-cell results back to particle order
    idx = jnp.maximum(cl.cells, 0)                       # [C, cap]
    valid = cl.cells >= 0
    acc = jnp.zeros((pos.shape[0], 3), pos.dtype)
    flat_idx = jnp.where(valid, idx, pos.shape[0]).reshape(-1)
    ax = out[:, 0, :].reshape(-1)
    ay = out[:, 1, :].reshape(-1)
    az = out[:, 2, :].reshape(-1)
    acc = acc.at[flat_idx, 0].set(ax, mode="drop")
    acc = acc.at[flat_idx, 1].set(ay, mode="drop")
    acc = acc.at[flat_idx, 2].set(az, mode="drop")
    return jnp.where(alive[:, None], acc, 0.0), cl.overflow
