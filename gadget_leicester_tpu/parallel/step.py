"""Sharded simulation step: the full KDK sync-point iteration jitted over a
device mesh with particle-dim shardings (dp over particles = the N-body
analog of data parallelism; the PM mesh and tree levels reshard as XLA
chooses — SURVEY.md §2 maps the reference's single parallelism strategy,
spatial domain decomposition, onto exactly this).
"""

from __future__ import annotations

from functools import partial

import jax

from gadget_leicester_tpu.core.config import SimConfig, SimOptions
from gadget_leicester_tpu.core.state import SimState
from gadget_leicester_tpu.models.simulation import sync_point_step
from gadget_leicester_tpu.parallel.mesh import shard_state, state_shardings


def make_sharded_step(state_template: SimState, cfg: SimConfig,
                      opts: SimOptions, mesh):
    """Build a jitted step function with explicit in/out shardings over
    `mesh`. Returns (step_fn, sharded_template) — call step_fn(state)."""
    sh = state_shardings(state_template, mesh)

    @partial(jax.jit, in_shardings=(sh,), out_shardings=sh,
             static_argnames=())
    def step(state: SimState) -> SimState:
        return sync_point_step(state, cfg, opts)

    return step, shard_state(state_template, mesh)
