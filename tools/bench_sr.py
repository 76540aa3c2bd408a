#!/usr/bin/env python
"""SR gravity kernel diagnosis at bench scale: is it VPU-, DMA-, or
build-bound? Usage: python -u tools/bench_sr.py [n_million]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(fn, *args, reps=3):
    fence(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / reps


def main():
    nm = float(sys.argv[1]) if len(sys.argv) > 1 else 4.2
    npart = int(nm * 1e6)
    box = 50000.0
    rng = np.random.default_rng(0)
    n_side = int(round(npart ** (1 / 3)))
    g = (np.indices((n_side,) * 3).reshape(3, -1).T + 0.5) * (box / n_side)
    g = g[:npart] + rng.normal(0, 0.05 * box / n_side, (min(npart, len(g)), 3))
    npart = len(g)
    pos = jnp.asarray(np.mod(g, box), jnp.float32)
    mass = jnp.ones((npart,), jnp.float32)
    soft = jnp.full((npart,), 36.5, jnp.float32)
    alive = jnp.ones((npart,), bool)

    pmgrid = 192
    from gadget_leicester_tpu.ops.pm import ASMTH, RCUT
    asmth_len = ASMTH * box / pmgrid
    rcut = RCUT * asmth_len
    n_cells = max(3, int(box / rcut))
    print(f"N={npart} n_cells={n_cells} occ={npart/n_cells**3:.0f}",
          flush=True)

    from gadget_leicester_tpu.ops.neighbors import build_cell_list
    from gadget_leicester_tpu.ops.pallas_cells import (
        pack_cells_soa, shortrange_gravity_pallas_dma)

    t = timeit(jax.jit(lambda p: build_cell_list(
        p, alive, 0.0, box, n_cells=n_cells, capacity=128,
        periodic=True)), pos)
    print(f"build_cell_list: {t*1e3:.0f} ms", flush=True)

    cl = jax.jit(lambda p: build_cell_list(
        p, alive, 0.0, box, n_cells=n_cells, capacity=128,
        periodic=True))(pos)
    t = timeit(jax.jit(lambda p: pack_cells_soa(cl, p, mass, soft, alive)),
               pos)
    print(f"pack_cells_soa: {t*1e3:.0f} ms", flush=True)

    def run(asmth, label):
        t = timeit(jax.jit(lambda p: shortrange_gravity_pallas_dma(
            p, mass, soft, alive, float(box), n_cells=n_cells, capacity=128,
            asmth=asmth, rcut=float(rcut), periodic=True)), pos)
        print(f"SR total ({label}): {t*1e3:.0f} ms", flush=True)

    run(float(asmth_len), "full")
    run(0.0, "no-trunc")  # removes the P7+exp truncation per pair

    from gadget_leicester_tpu.ops.pallas_cells import \
        shortrange_gravity_pallas_dma9

    t = timeit(jax.jit(lambda p: shortrange_gravity_pallas_dma9(
        p, mass, soft, alive, float(box), n_cells=n_cells, capacity=128,
        asmth=float(asmth_len), rcut=float(rcut), periodic=True)), pos)
    print(f"SR total (9-column): {t*1e3:.0f} ms", flush=True)
    a1, _ = jax.jit(lambda p: shortrange_gravity_pallas_dma9(
        p, mass, soft, alive, float(box), n_cells=n_cells, capacity=128,
        asmth=float(asmth_len), rcut=float(rcut), periodic=True))(pos)
    a0, _ = jax.jit(lambda p: shortrange_gravity_pallas_dma(
        p, mass, soft, alive, float(box), n_cells=n_cells, capacity=128,
        asmth=float(asmth_len), rcut=float(rcut), periodic=True))(pos)
    scale = float(jnp.max(jnp.abs(a0)))
    err = float(jnp.max(jnp.abs(a1 - a0))) / scale
    print(f"9-column vs 27-step max rel diff: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
