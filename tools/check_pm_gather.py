#!/usr/bin/env python
"""On-chip parity + timing for the column-tile PM gather vs the
row-gather CIC at bench-like scale (4.2M, pm 192, SR cells 34).

Usage: python -u tools/check_pm_gather.py [n_million]
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
from gadget_leicester_tpu.ops.pm import cic_gather_vec
from gadget_leicester_tpu.ops.pm_tiles import pm_gather_tiles


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(label, fn, reps=4):
    out = fn(jnp.float32(0.0))
    s = fence(out)
    dts = []
    for i in range(reps):
        salt = jnp.float32(abs(s) * 1e-30 + i + 1)
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
    margin = 0.08 * 4.5 * 1.25 * box / n_pm     # soft rcut margin
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    alive = jnp.ones((n,), bool)
    field = jnp.asarray(rng.normal(size=(n_pm, n_pm, n_pm, 3)),
                        jnp.float32)
    cl = build_cell_list(pos, alive, origin=jnp.zeros(3, jnp.float32),
                         extent=jnp.full(3, box, jnp.float32),
                         n_cells=n_cells, capacity=192, periodic=True)
    print("overflow:", bool(cl.overflow), flush=True)

    margin_pm = margin * n_pm / box

    row = jax.jit(lambda s: cic_gather_vec(field + s * 1e-12, pos, box,
                                           n_pm))
    tile = jax.jit(lambda s: pm_gather_tiles(
        field + s * 1e-12, cl, pos, alive, box=box, n_pm=n_pm,
        n_cells=n_cells, margin_pm=float(margin_pm)))

    a = timed("row-gather", row)
    b = timed("col-tile-gather", tile)
    a = np.asarray(a)
    b = np.asarray(b)
    scale = np.abs(a).max()
    err = np.abs(a - b).max() / scale
    print(f"max rel err {err:.3e}", flush=True)
    assert err < 2e-5, "PARITY FAIL"
    print("PM GATHER PARITY PASS", flush=True)


if __name__ == "__main__":
    main()
