"""Hybrid jit: compile at top level, inline under an enclosing trace.

Nested ``jax.jit`` (op-level jits composed inside the jitted simulation
step) triggered executable cross-wiring on this JAX build — second calls
of a cached step hit "Execution supplied N buffers but compiled program
expected M" / parameter-size mismatches. Ops therefore use
:func:`hybrid_jit`: standalone calls (tests, oracles, benchmarks) still get
a compiled wrapper, while calls inside ``sync_point_step``'s trace inline
the plain function — which is also what XLA would do anyway, minus the
buggy pjit bookkeeping.
"""

from __future__ import annotations

import functools

import jax
from jax._src import core as _jcore


def hybrid_jit(fn=None, **jit_kwargs):
    if fn is None:
        return lambda f: hybrid_jit(f, **jit_kwargs)
    jitted = jax.jit(fn, **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _jcore.trace_state_clean():
            return jitted(*args, **kwargs)
        return fn(*args, **kwargs)

    wrapper.__wrapped__ = fn
    wrapper.jitted = jitted
    return wrapper
