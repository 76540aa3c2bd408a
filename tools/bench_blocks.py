#!/usr/bin/env python
"""Micro-bench: block-packed SPH kernels vs the coarse pallas path at
bench scale. Usage: python -u tools/bench_blocks.py [n_gas_million] [subcap]
"""
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
    t0 = time.time()
    fence(fn(*args))
    print(f"    (compile+first: {time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / reps


def main():
    nm = float(sys.argv[1]) if len(sys.argv) > 1 else 2.1
    subcap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ng = int(nm * 1e6)
    box = 50000.0
    rng = np.random.default_rng(0)
    # near-grid positions (bench-like occupancy statistics)
    n_side = int(round(ng ** (1 / 3)))
    g = (np.indices((n_side,) * 3).reshape(3, -1).T + 0.5) * (box / n_side)
    g = g[:ng] + rng.normal(0, 0.05 * box / n_side, (min(ng, len(g)), 3))
    ng = len(g)
    pos = jnp.asarray(np.mod(g, box), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(ng, 3)), jnp.float32)
    mass = jnp.ones((ng,), jnp.float32)
    spacing = box / n_side
    h0 = jnp.full((ng,), 2.0 * spacing, jnp.float32)
    mask = jnp.ones((ng,), bool)

    from gadget_leicester_tpu.ops.sph_blocks import (build_block_lists,
                                                     density_adaptive_blocks,
                                                     density_sums_blocks,
                                                     hydro_force_blocks)
    from gadget_leicester_tpu.ops.pallas_cells import pack_sph_soa

    n_blocks = max(2, int(round((ng / (8 * 0.78 * subcap)) ** (1 / 3))))
    print(f"ng={ng} subcap={subcap} n_blocks={n_blocks} "
          f"(sub occ={ng/(2*n_blocks)**3:.1f})", flush=True)

    t = timeit(jax.jit(lambda p: build_block_lists(
        p, mask, 0.0, box, n_blocks=n_blocks, subcap=subcap,
        periodic=True)), pos)
    print(f"build_block_lists: {t*1e3:.0f} ms", flush=True)

    cl_e, cl_o = jax.jit(lambda p: build_block_lists(
        p, mask, 0.0, box, n_blocks=n_blocks, subcap=subcap,
        periodic=True))(pos)
    print("overflow:", bool(cl_e.overflow), flush=True)
    soa_e = pack_sph_soa(cl_e, pos, vel, mass, jnp.ones(ng), mask)
    soa_o = pack_sph_soa(cl_o, pos, vel, mass, jnp.ones(ng), mask)
    b, lanes = cl_e.cells.shape
    idx = jnp.maximum(cl_e.cells, 0)
    h_slots = jnp.where(cl_e.cells >= 0, h0[idx], 1.0)

    t = timeit(jax.jit(lambda se, so, hs: density_sums_blocks(
        cl_e, se, so, hs, box)), soa_e, soa_o, h_slots)
    print(f"one block density sweep: {t*1e3:.0f} ms", flush=True)

    max_hsml = box / (2 * n_blocks)

    t = timeit(jax.jit(lambda p, v, h: density_adaptive_blocks(
        p, v, mass, jnp.minimum(h, max_hsml), mask, des_num_ngb=33.0,
        max_dev=2.0, box=box, n_blocks=n_blocks, subcap=subcap,
        max_hsml=max_hsml, periodic=True)), pos, vel, h0)
    print(f"block density adaptive: {t*1e3:.0f} ms", flush=True)

    dres, cls = jax.jit(lambda p, v, h: density_adaptive_blocks(
        p, v, mass, jnp.minimum(h, max_hsml), mask, des_num_ngb=33.0,
        max_dev=2.0, box=box, n_blocks=n_blocks, subcap=subcap,
        max_hsml=max_hsml, periodic=True))(pos, vel, h0)
    print("iters:", int(dres.iters), flush=True)
    pressure = jnp.maximum(dres.rho, 1e-10) ** (5.0 / 3.0)

    t = timeit(jax.jit(lambda p, v: hydro_force_blocks(
        cls, p, v, mass, dres.hsml, dres.rho, pressure, dres.dhsml_factor,
        dres.div_vel, dres.curl_vel, mask, visc_const=0.8, box=box)),
        pos, vel)
    print(f"block hydro: {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
