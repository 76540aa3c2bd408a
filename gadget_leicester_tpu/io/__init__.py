"""I/O layer (L8): bit-compatible GADGET snapshot/IC formats 1, 2 and HDF5,
restart checkpointing, diagnostic file writers.

[G2: io.c, read_ic.c, restart.c] — the bit-compat requirement (BASELINE.md)
means existing GADGET ICs and analysis tools must work unchanged.
"""

from gadget_leicester_tpu.io.snapshot import (SnapshotData, read_snapshot,
                                              write_snapshot, Header)
