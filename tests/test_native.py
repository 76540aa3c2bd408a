"""Native helper tests: Peano-Hilbert curve properties, record scanning,
host CIC — including C-vs-numpy fallback parity."""

import numpy as np
import pytest

from gadget_leicester_tpu.utils import native


def _all_coords(bits):
    n = 1 << bits
    g = np.indices((n, n, n)).reshape(3, -1).T.astype(np.uint32)
    return g


@pytest.mark.parametrize("bits", [1, 2, 3])
def test_hilbert_bijective(bits):
    coords = _all_coords(bits)
    keys = native._hilbert_keys_py(coords, bits)
    n3 = (1 << bits) ** 3
    assert len(np.unique(keys)) == n3
    assert keys.min() == 0 and keys.max() == n3 - 1


@pytest.mark.parametrize("bits", [1, 2, 3])
def test_hilbert_continuity(bits):
    """Defining property of the Hilbert curve: consecutive keys are
    face-adjacent cells (|step| == 1 in exactly one axis)."""
    coords = _all_coords(bits)
    keys = native._hilbert_keys_py(coords, bits)
    order = np.argsort(keys)
    walk = coords[order].astype(np.int64)
    step = np.abs(np.diff(walk, axis=0))
    assert np.all(step.sum(axis=1) == 1), "curve jumps between non-adjacent cells"


def test_native_matches_python_fallback():
    if not native.have_native():
        pytest.skip("native module not built")
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (500, 3))
    k_any = native.peano_hilbert_keys(pos, 0.0, 1.0, bits=10)
    coords = np.clip((pos * (1 << 10)).astype(np.int64), 0,
                     (1 << 10) - 1).astype(np.uint32)
    k_py = native._hilbert_keys_py(coords, 10)
    np.testing.assert_array_equal(k_any, k_py)


def test_ph_order_locality(rng):
    """PH-sorted consecutive particles are spatially close (the property
    domain decomposition relies on) [G2: peano.c]."""
    pos = rng.uniform(0, 1, (2000, 3))
    order = native.peano_hilbert_order(pos, 0.0, 1.0, bits=10)
    d_sorted = np.linalg.norm(np.diff(pos[order], axis=0), axis=1)
    d_random = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    assert np.median(d_sorted) < 0.25 * np.median(d_random)


def test_scan_f77_records(tmp_path, rng):
    if not native.have_native():
        pytest.skip("native module not built")
    from gadget_leicester_tpu.io.snapshot import write_snapshot
    from tests.test_io_snapshot import _mk_snap
    snap = _mk_snap(rng)
    p = str(tmp_path / "s")
    write_snapshot(p, snap, fmt=1)
    data = open(p, "rb").read()
    is_le, recs = native.scan_f77_records(data)
    assert is_le == 1
    assert recs[0] == (4, 256)          # header
    n = int(snap.header.npart.sum())
    assert recs[1][1] == 12 * n         # POS block

    # corrupted marker -> error with offset
    bad = bytearray(data)
    bad[4 + 256] ^= 0xFF
    with pytest.raises(ValueError, match="marker mismatch"):
        native.scan_f77_records(bytes(bad))


def test_host_cic_matches_device(rng):
    import jax.numpy as jnp
    from gadget_leicester_tpu.ops.pm import cic_deposit
    n, g, box = 300, 8, 2.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    host = native.cic_deposit_host(pos, mass, g, box)
    dev = np.asarray(cic_deposit(jnp.asarray(pos), jnp.asarray(mass), box, g))
    np.testing.assert_allclose(host, dev, rtol=1e-4, atol=1e-5)
