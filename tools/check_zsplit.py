#!/usr/bin/env python
"""On-chip parity check for the z-split DMA SPH block kernels vs the
all-pairs dense oracle (mirrors tests/test_sph_blocks.py, which covers
the interpret path on CPU — the DMA kernels have no CPU coverage, so
every kernel-structure change re-runs this on the TPU).

Usage: python -u tools/check_zsplit.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from gadget_leicester_tpu.ops.sph_blocks import (density_adaptive_blocks,
                                                 hydro_force_blocks)
from gadget_leicester_tpu.ops.sph_dense import (density_adaptive,
                                                hydro_force)


def run_case(rng, n, n_blocks, subcap, box=2.0):
    print(f"case n={n} n_blocks={n_blocks} subcap={subcap} "
          f"(lanes {8 * subcap})", flush=True)
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    mass = jnp.full((n,), 1.0 / n, jnp.float32)
    h0 = jnp.full((n,), 0.25, jnp.float32)
    mask = np.ones(n, bool)
    mask[-5:] = False
    mask = jnp.asarray(mask)
    max_hsml = box / (2 * n_blocks)

    r1 = density_adaptive(pos, vel, mass, h0, mask, des_num_ngb=33.0,
                          max_dev=2.0, box=box, periodic=True)
    hmax = float(jnp.max(jnp.where(mask, r1.hsml, 0.0)))
    assert hmax < max_hsml, f"h {hmax} >= cap {max_hsml} (bad case setup)"
    r2, cls = density_adaptive_blocks(
        pos, vel, mass, h0, mask, des_num_ngb=33.0, max_dev=2.0,
        box=box, n_blocks=n_blocks, subcap=subcap, max_hsml=max_hsml,
        periodic=True, interpret=False)
    m = np.asarray(mask)

    def check(name, a, b, rtol, atol=1e-6):
        a, b = np.asarray(a)[m], np.asarray(b)[m]
        err = np.abs(a - b) / np.maximum(np.abs(a) + atol, atol)
        print(f"  {name:6s} max rel err {err.max():.3e}", flush=True)
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)

    check("rho", r1.rho, r2.rho, 5e-4)
    check("hsml", r1.hsml, r2.hsml, 5e-3)
    check("divv", r1.div_vel, r2.div_vel, 1e-2, 1e-4)
    check("curlv", r1.curl_vel, r2.curl_vel, 1e-2, 1e-4)

    pr = jnp.asarray(np.asarray(r1.rho) ** 2 * 0.1, jnp.float32)
    args = (pos, vel, mass, r2.hsml, r2.rho, pr, r2.dhsml_factor,
            r2.div_vel, r2.curl_vel, mask)
    h1 = hydro_force(pos, vel, mass, r1.hsml, r1.rho, pr,
                     r1.dhsml_factor, r1.div_vel, r1.curl_vel, mask,
                     visc_const=0.8, box=box, periodic=True)
    h2 = hydro_force_blocks(cls, *args, visc_const=0.8, box=box,
                            interpret=False)
    check("acc", h1.acc, h2.acc, 2e-2, 1e-3)
    check("dte", h1.dt_entropy, h2.dt_entropy, 2e-2, 1e-3)
    check("msv", h1.max_signal_vel, h2.max_signal_vel, 5e-3, 1e-4)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(7)
    run_case(rng, n=3000, n_blocks=2, subcap=128)   # lanes 1024, half 512
    run_case(rng, n=6000, n_blocks=3, subcap=64)    # lanes 512, half 256
    print("ZSPLIT PARITY PASS", flush=True)


if __name__ == "__main__":
    main()
