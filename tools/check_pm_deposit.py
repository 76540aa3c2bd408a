#!/usr/bin/env python
"""On-chip parity + timing for the cell-tile PM deposit at bench-like
scale, with and without the bf16x3 (HIGHEST) MXU precision fix —
decides whether the accuracy cost of the default-bf16 path or the MXU
cost of the fix is the right production trade.

Usage: python -u tools/check_pm_deposit.py [n_million]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from gadget_leicester_tpu.ops.neighbors import build_cell_list
from gadget_leicester_tpu.ops.pm import cic_deposit
from gadget_leicester_tpu.ops.pm_tiles import pm_deposit_tiles


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(label, fn, reps=4):
    out = fn(jnp.float32(0.0))
    s = fence(out)
    dts = []
    for i in range(reps):
        salt = jnp.float32(abs(s) * 1e-30 + (i + 1) * 1e-6)
        t0 = time.time()
        out = fn(salt)
        s = fence(out)
        dts.append((time.time() - t0) * 1e3)
    print(f"{label}: {min(dts):.1f} ms "
          f"({', '.join(f'{d:.0f}' for d in dts)})", flush=True)
    return out


def main():
    n_mill = float(sys.argv[1]) if len(sys.argv) > 1 else 4.2
    print("device:", jax.devices()[0], flush=True)
    n = int(n_mill * 1e6)
    box, n_pm, n_cells = 50000.0, 192, 34
    margin = 0.08 * 4.5 * 1.25 * box / n_pm
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    mass = jnp.asarray(1.0 + 0.1 * rng.random((n,)), jnp.float32)
    alive = jnp.ones((n,), bool)
    cl = build_cell_list(pos, alive, origin=jnp.zeros(3, jnp.float32),
                         extent=jnp.full(3, box, jnp.float32),
                         n_cells=n_cells, capacity=192, periodic=True)
    print("overflow:", bool(cl.overflow), flush=True)
    margin_pm = margin * n_pm / box

    ref = jax.jit(lambda s: cic_deposit(pos + s, mass, alive, box, n_pm))
    tile = jax.jit(lambda s: pm_deposit_tiles(
        cl, pos + s * 0.0, mass + s, alive, box, n_pm, n_cells,
        margin_pm))
    g_ref = timed("point-scatter", ref)
    g_tile = timed("deposit-tiles", tile)
    scale = float(jnp.max(jnp.abs(g_ref)))
    err = float(jnp.max(jnp.abs(g_tile - g_ref))) / scale
    print(f"max rel err {err:.3e}", flush=True)
    print("total mass rel diff",
          float(abs(jnp.sum(g_tile) - jnp.sum(g_ref)) / jnp.sum(g_ref)),
          flush=True)


if __name__ == "__main__":
    main()
