"""Cell-tile PM mesh interpolation — the TPU-native CIC gather/deposit.

The row-gather CIC (`ops.pm.cic_gather_vec`) is one [8K]-row random HBM
gather per particle, and the deposit eight point scatter-adds; measured
0.63 s + 0.34 s of the 2.39 s full step at 128^3 (BASELINE.md round-3
budget) — XLA gather/scatter dispatch, not bandwidth, is the wall. This
module replaces both with the cell-tile idiom the short-range kernels
already use [G2: pm_periodic.c :: pmforce_periodic() interpolation and
mass-assignment loops — same physics, different layout]:

  * particles are already binned into short-range cells (CellList,
    stale-tolerant within ``margin`` — models.grids); all particles of a
    cell touch one small window of the PM mesh,
  * per cell, ONE strided DMA streams that window into VMEM
    (double-buffered across grid steps),
  * the per-particle trilinear interpolation becomes SEPARABLE weighted
    one-hot contractions on the MXU/VPU (wx*wy via a [cap, W*WY]
    one-hot matmul, wz as a tiny second contraction) — the TPU gather
    idiom: no random addressing anywhere.

Mosaic DMA slices must be tile-aligned (sublane dim multiples of 8,
lane dim multiples of 128), so window bases are aligned DOWN and the
in-kernel one-hots carry the per-cell (delta_y, delta_z) remainders.

The deposit is the transpose contraction, accumulated window-by-window
as a serial read-modify-write over the padded mesh; cells walk in
(x, y) color-class order so consecutive windows are disjoint and the
in/out DMAs pipeline (deposit windows span full z columns — lane
alignment for K=1 would force 128-cell z slices anyway).
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


def _window_geometry(n_pm: int, n_cells: int, margin_pm: float):
    """Static window size W and low-side pad P0 (in PM cells).

    A particle assigned to cell cx sits within [cx*edge - m, (cx+1)*edge
    + m) in PM units (stale-tolerance margin m); CIC touches floor(u)
    and floor(u)+1, so the window [floor(cx*edge - m), ...] must span
    ceil(edge + 2m) + 2 cells (+1 slack for floor jitter at non-integer
    edges)."""
    edge_pm = n_pm / n_cells
    w = int(np.ceil(edge_pm + 2.0 * margin_pm)) + 3
    p0 = int(np.ceil(margin_pm)) + 1
    return w, p0


def _cic_xy_factors(t, bx, by, delta_y, n_pm: int, w: int, wy: int,
                    cap: int, scale: float, dtype, off_pm=(0.0, 0.0, 0.0)):
    """Separable CIC xy factor for the window of one cell.

    Returns (axy [cap, w*wy], lz-part inputs (iz, fz), valid) with
    axy[p, lx*wy + ly + delta_y] = wx*wy*valid over the 4 (dx, dy)
    corner combos — trilinear weight factors as wx*wy*wz; z is applied
    as a tiny second contraction (keeps every intermediate
    lane-preserving for Mosaic).

    ``t`` is the [8, cap] cell tile (x, y, z, mass, soft, valid, ...)
    with CELL-RELATIVE coordinates (pack_cells_soa relative=True);
    ``off_pm`` is the cell center in PM units, restoring absolute mesh
    coordinates. bx/by are the RAW (possibly negative) window bases;
    ``delta_y`` the sublane-alignment remainder of the y base."""
    valid = t[5, :]                      # 1 for packed slots, 0 parked
    ux = t[0, :] * scale + off_pm[0]
    uy = t[1, :] * scale + off_pm[1]
    uz = t[2, :] * scale + off_pm[2]
    ix = jnp.floor(ux)
    iy = jnp.floor(uy)
    iz = jnp.floor(uz)
    fx = ux - ix
    fy = uy - iy
    fz = uz - iz
    # local indices: mod-wrap absorbs unwrapped positions AND windows
    # crossing the periodic seam (the padded field carries wrap copies)
    lx = jax.lax.rem(ix.astype(jnp.int32) - bx + (2 * n_pm), n_pm)
    ly = jax.lax.rem(iy.astype(jnp.int32) - by + (2 * n_pm), n_pm)
    # clamp: a particle beyond the staleness margin (impossible by the
    # rebuild contract, defensive only) reads a wrong-but-finite corner
    lx = jnp.minimum(lx, w - 2)
    ly = jnp.minimum(ly, w - 2) + delta_y

    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, w * wy), 1)
    axy = jnp.zeros((cap, w * wy), dtype)
    for dx in (0, 1):
        wxw = (1.0 - fx) if dx == 0 else fx
        gx = (lx + dx) * wy
        for dy in (0, 1):
            wyw = (1.0 - fy) if dy == 0 else fy
            idx = gx + (ly + dy)
            axy = axy + jnp.where(iota == idx[:, None],
                                  (wxw * wyw * valid)[:, None], 0.0)
    return axy, iz, fz


def _align_up(v: int, a: int) -> int:
    return ((v + a - 1) // a) * a


def _make_gather_col_kernel(n_pm: int, w: int, wy: int, nzk: int, p0: int,
                            k_comp: int, cap: int, scale: float,
                            n_cells: int, edge_pm: float, margin_pm: float,
                            zsl: int):
    """COLUMN gather kernel: grid = (n_cells^2,), one full-z window DMA
    per (cx, cy) column (vs one per CELL in the first-cut gather kernel,
    whose 39k small DMAs measured 285 ms at the 128^3 config against the
    row-gather's 194 — the deposit's column windows run 132). The inner
    fori walks the column's z-cells; each cell's z-reach is a 128-aligned
    ``zsl``-lane dynamic slice of the resident window, so the xy one-hot
    contraction shrinks from the full z row to [w*wy, zsl]."""

    def base_of(cc):
        cc = jnp.asarray(cc, jnp.float32)
        return jnp.floor(cc * edge_pm - margin_pm).astype(jnp.int32)

    def center_pm(cc):
        return (jnp.asarray(cc, jnp.float32) + 0.5) * edge_pm

    def kernel(tgt_ref, fp_hbm, out_ref, buf, sems):
        j = pl.program_id(0)
        n_cols = pl.num_programs(0)

        def dma(col, slot):
            bx = base_of(col // n_cells) + p0
            by_al = ((base_of(col % n_cells) + p0) // 8) * 8
            return pltpu.make_async_copy(
                fp_hbm.at[pl.ds(bx, w), pl.ds(by_al, wy), :],
                buf.at[slot], sems.at[slot])

        @pl.when(j == 0)
        def _():
            dma(0, 0).start()

        @pl.when(j + 1 < n_cols)
        def _():
            dma(j + 1, jax.lax.rem(j + 1, 2)).start()

        slot = jax.lax.rem(j, 2)
        dma(j, slot).wait()

        cx_i, cy_i = j // n_cells, j % n_cells
        bx_i, by_i = base_of(cx_i), base_of(cy_i)
        delta_y = jax.lax.rem(by_i + p0, 8)
        offx, offy = center_pm(cx_i), center_pm(cy_i)

        def cell(kz, _):
            t = tgt_ref[kz]                      # [8, cap]
            bz_i = base_of(kz)
            axy, iz, fz = _cic_xy_factors(
                t, bx_i, by_i, delta_y, n_pm, w, wy, cap, scale,
                out_ref.dtype, off_pm=(offx, offy, center_pm(kz)))
            lz = jax.lax.rem(iz.astype(jnp.int32) - bz_i + (2 * n_pm),
                             n_pm)
            lz = jnp.minimum(lz, w - 2)
            zoff = (((bz_i + p0) * k_comp) // 128) * 128
            delta_z = (bz_i + p0) * k_comp - zoff
            # ref-level dynamic lane slice (128-aligned by construction)
            fbs = jnp.reshape(buf[slot, :, :, pl.ds(zoff, zsl)],
                              (w * wy, zsl))
            # HIGHEST: the MXU's default f32 path rounds through bf16
            # (measured 4e-3 rel error vs the row gather); bf16x3 passes
            # restore f32-grade products at 3x MXU cost — still cheap
            c_zk = jnp.dot(axy, fbs, preferred_element_type=fbs.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            iota = jax.lax.broadcasted_iota(jnp.int32, (cap, zsl), 1)
            base_lane = lz * k_comp + delta_z
            for k in range(k_comp):
                m0 = jnp.where(iota == (base_lane + k)[:, None],
                               (1.0 - fz)[:, None], 0.0)
                m1 = jnp.where(iota == (base_lane + k_comp + k)[:, None],
                               fz[:, None], 0.0)
                out_ref[kz, k, :] = jnp.sum((m0 + m1) * c_zk, axis=1)
            return 0

        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        jax.lax.fori_loop(0, n_cells, cell, 0)

    return kernel


@partial(hybrid_jit, static_argnames=("box", "n_pm", "n_cells",
                                      "margin_pm", "interpret"))
def pm_gather_tiles(field, cl: CellList, pos, alive, box: float, n_pm: int,
                    n_cells: int, margin_pm: float,
                    interpret: bool = False):
    """CIC-interpolate a [n_pm]^3 x K mesh field to particles via their
    (possibly stale) short-range cell tiles. Returns [N, K].

    ``margin_pm``: the grid cache's staleness margin in PM-cell units
    (grav_grid_geometry margin * n_pm / box) — sizes the per-cell window
    so every in-margin particle's 2x2x2 CIC neighbourhood is inside it.
    """
    from gadget_leicester_tpu.ops.pallas_cells import pack_cells_soa

    k_comp = field.shape[-1]
    n = n_pm
    w, p0 = _window_geometry(n, n_cells, margin_pm)
    edge_pm = n / n_cells
    wy = _align_up(w + 7, 8)
    # per-cell z-reach slice width: alignment remainder (< 128) + the
    # window's own z*K extent, rounded up to whole lane tiles
    zsl = _align_up(128 + w * k_comp, 128)

    # wrap-padded field, z*K packed contiguously; high-side padding so
    # every aligned-down [zoff, zoff+zsl) cell slice stays in range
    fp = jnp.concatenate([field[-p0:], field, field[:w]], axis=0)
    fp = jnp.concatenate([fp[:, -p0:], fp, fp[:, :w]], axis=1)
    fp = jnp.concatenate([fp[:, :, -p0:], fp, fp[:, :, :w]], axis=2)
    n2 = n + p0 + w
    fp = fp.reshape(n2, n2, n2 * k_comp)
    ny = _align_up(n2 + (wy - w), 8)
    max_zoff = (((n - 1 + p0) * k_comp) // 128) * 128
    nzk = max(_align_up(n2 * k_comp, 128), max_zoff + zsl)
    fp = jnp.pad(fp, ((0, 0), (0, ny - n2), (0, nzk - n2 * k_comp)))

    soa = pack_cells_soa(cl, pos, jnp.ones_like(pos[:, 0]),
                         jnp.ones_like(pos[:, 0]), alive, relative=True)
    cap = soa.shape[-1]

    out = pl.pallas_call(
        _make_gather_col_kernel(n, w, wy, nzk, p0, k_comp, cap,
                                float(n / box), n_cells, float(edge_pm),
                                float(margin_pm), zsl),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_cells * n_cells,),
            in_specs=[
                pl.BlockSpec((n_cells, 8, cap), lambda ci: (ci, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((n_cells, 8, cap),
                                   lambda ci: (ci, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, w, wy, nzk), field.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_cells ** 3, 8, cap), field.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(soa, fp)

    with jax.named_scope("pm_gather_merge"):
        idx = jnp.maximum(cl.cells, 0)
        valid = cl.cells >= 0
        n_p = pos.shape[0]
        flat_idx = jnp.where(valid, idx, n_p).reshape(-1)
        res = jnp.zeros((n_p + 1, k_comp), field.dtype)
        for k in range(k_comp):
            res = res.at[flat_idx, k].set(out[:, k, :].reshape(-1),
                                          mode="drop")
        return jnp.where(alive[:, None], res[:n_p], 0.0)


# ---------------------------------------------------------------------------
# Deposit: the scatter dual — color-classed serial read-modify-write
# ---------------------------------------------------------------------------
def _column_color_order(n_cells: int, sx: int, sy: int):
    """Static (cx, cy) COLUMN evaluation order grouped into color
    classes: two columns of the same class differ by >= sx in cx or
    >= sy in cy, so their full-z deposit windows are DISJOINT in the
    padded mesh and their read-modify-write DMAs may overlap. Returns
    (order [n^2] int32 of cx*n+cy, boundaries: indices where a new
    class starts, excluding 0)."""
    g = np.arange(n_cells)
    cx, cy = np.meshgrid(g, g, indexing="ij")
    col = (cx * n_cells + cy).ravel()
    color = ((cx % sx) * sy + (cy % sy)).ravel()
    perm = np.argsort(color, kind="stable")
    counts = np.bincount(color, minlength=sx * sy)
    bounds = np.cumsum(counts)[:-1]
    return (col[perm].astype(np.int32),
            [int(b) for b in bounds if 0 < b < len(col)])


def _make_deposit_kernel(n_pm: int, w: int, wy: int, zdim: int, p0: int,
                         cap: int, scale: float, boundaries, n_cells: int,
                         edge_pm: float, margin_pm: float):
    """Column read-modify-write deposit on a (n^2 columns, n z-cells)
    grid: ONE full-z window in-DMA per (cx, cy) column, += separable
    one-hot contributions from each of its n_cells z-cells, one out-DMA
    back. Columns arrive in color-class order; within a class windows
    are disjoint, so the next column's window streams in while this one
    accumulates. Crossing a class boundary drains the pending out-DMA
    first (the next window may overlap it). Window bases derive
    in-kernel from ``order_ref`` (a bases table would be lane-padded in
    SMEM — see _make_gather_kernel)."""

    def base_of(cc):
        # cc may be a Python int (static grid-step 0) or a traced scalar
        cc = jnp.asarray(cc, jnp.float32)
        return jnp.floor(cc * edge_pm - margin_pm).astype(jnp.int32)

    def kernel(order_ref, tgt_ref, acc_in_hbm, acc_hbm,
               buf, in_sems, out_sems):
        # order_ref drives the tgt BlockSpec AND the window bases;
        # acc_in_hbm is the donated zero mesh (aliased to acc_hbm, used
        # via the out ref)
        j = pl.program_id(0)
        kz = pl.program_id(1)
        n_cols = pl.num_programs(0)
        n_c = pl.num_programs(1)

        def bases2(c):
            col = order_ref[c]
            return base_of(col // n_cells), base_of(col % n_cells)

        def window(c):
            bxr, byr = bases2(c)
            bx = bxr + p0
            by_al = ((byr + p0) // 8) * 8
            return acc_hbm.at[pl.ds(bx, w), pl.ds(by_al, wy), :]

        def dma_in(c, slot):
            return pltpu.make_async_copy(window(c), buf.at[slot],
                                         in_sems.at[slot])

        def dma_out(c, slot):
            return pltpu.make_async_copy(buf.at[slot], window(c),
                                         out_sems.at[slot])

        slot = jax.lax.rem(j, 2)
        other = jax.lax.rem(j + 1, 2)

        if boundaries:
            # bnd: j+1 starts a new class; bnd_prev: j itself does (its
            # predecessor's cross-class drain already waited everything,
            # so re-waiting dma_out(j-1) here would hang the semaphore)
            bnd = (j + 1 == boundaries[0])
            bnd_prev = (j == boundaries[0])
            for b in boundaries[1:]:
                bnd = bnd | (j + 1 == b)
                bnd_prev = bnd_prev | (j == b)
        else:
            bnd = j < 0                          # never
            bnd_prev = j < 0

        @pl.when((j == 0) & (kz == 0))
        def _():
            dma_in(0, 0).start()

        @pl.when(kz == 0)
        def _():
            dma_in(j, slot).wait()
            # prefetch the next column's window while accumulating,
            # unless it crosses a class boundary (possible overlap with
            # THIS column's not-yet-written result)
            @pl.when((j + 1 < n_cols) & jnp.logical_not(bnd))
            def _():
                @pl.when((j >= 1) & jnp.logical_not(bnd_prev))
                def _():
                    dma_out(j - 1, other).wait()     # free the buffer
                dma_in(j + 1, other).start()

        t = tgt_ref[0]
        col_j = order_ref[j]
        bx_j, by_j = bases2(j)
        delta_y = jax.lax.rem(by_j + p0, 8)
        off = ((jnp.asarray(col_j // n_cells, jnp.float32) + 0.5) * edge_pm,
               (jnp.asarray(col_j % n_cells, jnp.float32) + 0.5) * edge_pm,
               (jnp.asarray(kz, jnp.float32) + 0.5) * edge_pm)
        axy, iz, fz = _cic_xy_factors(t, bx_j, by_j,
                                      delta_y, n_pm, w, wy, cap, scale,
                                      buf.dtype, off_pm=off)
        # z is ABSOLUTE here (full-z window): lz = mod(iz, n) + p0; the +1
        # corner may land in the high wrap pad — folded back by the host
        lz = jax.lax.rem(iz.astype(jnp.int32) + (2 * n_pm), n_pm) + p0
        m = t[3, :]                              # mass row (0 for parked)
        iota = jax.lax.broadcasted_iota(jnp.int32, (cap, zdim), 1)
        cz = (jnp.where(iota == lz[:, None], (m * (1.0 - fz))[:, None], 0.0)
              + jnp.where(iota == (lz + 1)[:, None], (m * fz)[:, None],
                          0.0))
        # contract over particles: dep[xy, z] = sum_p axy[p,xy] cz[p,z].
        # HIGHEST precision: the default MXU f32 path rounds the one-hot
        # products through bf16 (4e-3 rel deposit noise — measured on the
        # gather twin); bf16x3 restores f32-grade sums
        dep = jax.lax.dot_general(
            axy, cz, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=buf.dtype,
            precision=jax.lax.Precision.HIGHEST)  # [w*wy, zdim]
        buf[slot] = buf[slot] + jnp.reshape(dep, (w, wy, zdim))

        @pl.when(kz == n_c - 1)
        def _():
            dma_out(j, slot).start()

            @pl.when((j + 1 < n_cols) & bnd)
            def _():
                @pl.when((j >= 1) & jnp.logical_not(bnd_prev))
                def _():
                    dma_out(j - 1, other).wait()
                dma_out(j, slot).wait()          # cross-class drain
                dma_in(j + 1, other).start()

            @pl.when(j + 1 >= n_cols)
            def _():
                @pl.when((j >= 1) & jnp.logical_not(bnd_prev))
                def _():
                    dma_out(j - 1, other).wait()
                dma_out(j, slot).wait()

    return kernel


@partial(hybrid_jit, static_argnames=("box", "n_pm", "n_cells",
                                      "margin_pm", "interpret"))
def pm_deposit_tiles(cl: CellList, pos, mass, alive, box: float, n_pm: int,
                     n_cells: int, margin_pm: float,
                     interpret: bool = False, soa=None):
    """CIC mass assignment onto an [n_pm]^3 periodic mesh via the
    (possibly stale) short-range cell tiles — the deposit dual of
    pm_gather_tiles [G2: pm_periodic.c mass-assignment loop]. Returns
    the mesh [n_pm, n_pm, n_pm].

    Each cell's particles land in one margin-padded (x, y) window
    spanning full z; the kernel walks cells in color-class order doing
    window read-modify-write with one-hot^T MXU deposits — no scatter
    anywhere. The padded accumulator folds back periodically at the
    end."""
    from gadget_leicester_tpu.ops.pallas_cells import pack_cells_soa

    n = n_pm
    w, p0 = _window_geometry(n, n_cells, margin_pm)
    edge_pm = n / n_cells
    wy = _align_up(w + 7, 8)
    # disjointness strides: raw bases of same-class columns differ by
    # >= s*edge - 1 (floor jitter); aligned-down y bases sit up to 7
    # further below, so y needs sy*edge - 1 - 7 >= wy, x just sx*edge-1>=w
    sx = max(1, int(np.ceil((w + 1) / edge_pm)))
    sy = max(1, int(np.ceil((wy + 8) / edge_pm)))
    sx = min(sx, n_cells)
    sy = min(sy, n_cells)
    order, bounds = _column_color_order(n_cells, sx, sy)
    n_cols = n_cells * n_cells
    f = pos.dtype

    if soa is None:
        m = jnp.where(alive, mass, 0.0).astype(f)
        soa = pack_cells_soa(cl, pos, m, jnp.ones_like(m), alive,
                             relative=True)
    cap = soa.shape[-1]
    n2 = n + p0 + w
    ny = _align_up(n2 + (wy - w), 8)
    zdim = _align_up(n2, 128)
    acc0 = jnp.zeros((n2, ny, zdim), f)
    order_j = jnp.asarray(order)

    acc = pl.pallas_call(
        _make_deposit_kernel(n, w, wy, zdim, p0, cap, float(n / box),
                             bounds, n_cells, float(edge_pm),
                             float(margin_pm)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,           # order (bases derive from it)
            # column-major walk, cz fastest: one window RMW per column
            grid=(n_cols, n_cells),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, cap),
                    lambda j, kz, order_ref:
                        (order_ref[j] * n_cells + kz, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, w, wy, zdim), f),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n2, ny, zdim), f),
        input_output_aliases={2: 0},         # acc0 donates the accumulator
        # (indices count ALL operands incl. the scalar-prefetch array)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(order_j, soa, acc0)

    # fold the wrap pads back into the core mesh (periodic images)
    with jax.named_scope("pm_deposit_fold"):
        acc = acc[:, :n2, :n2]               # drop alignment scratch
        for ax in range(3):
            sl = [slice(None)] * 3

            def take(a, s):
                sl2 = list(sl)
                sl2[ax] = s
                return a[tuple(sl2)]

            core = take(acc, slice(p0, p0 + n))
            lo = take(acc, slice(0, p0))          # global [n-p0, n)
            hi = take(acc, slice(p0 + n, n2))     # global [0, w)
            idx_lo = [slice(None)] * 3
            idx_lo[ax] = slice(n - p0, n)
            idx_hi = [slice(None)] * 3
            idx_hi[ax] = slice(0, w)
            core = core.at[tuple(idx_lo)].add(lo)
            core = core.at[tuple(idx_hi)].add(hi)
            acc = core
        return acc
