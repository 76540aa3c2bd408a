"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4
item 6 — the rebuild analog of `mpirun -np K` on one box).

NOTE: this environment's sitecustomize force-registers the 'axon' TPU
plugin and sets jax_platforms='axon,cpu' — a plain JAX_PLATFORMS env var
is NOT enough; the config must be updated before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # function-scoped + per-test seed: random data is deterministic and
    # INDEPENDENT of test execution order (a shared session stream made
    # borderline-tolerance tests order-flaky)
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode())  # stable across runs
    return np.random.default_rng(seed)
