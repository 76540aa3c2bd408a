#!/usr/bin/env python
"""Generate IC files for the example workloads (the reference ships binary
IC data; the mount was empty, so these regenerate each setup from its
published physical definition — models/ics.py).

    python parameterfiles/make_ics.py gassphere|galaxy|cluster|lcdm_gas|disc [outfile]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gassphere"
    out = sys.argv[2] if len(sys.argv) > 2 else f"./{which}_ics.dat"

    from gadget_leicester_tpu.io.snapshot import (Header, SnapshotData,
                                                  write_snapshot)
    from gadget_leicester_tpu.models import ics

    box = 0.0
    if which == "gassphere":
        pos, vel, mass, ptype, u = ics.gassphere_ics(mode="grid")
    elif which == "galaxy":
        pos, vel, mass, ptype, u = ics.galaxy_collision_ics(n_each=10000)
    elif which == "cluster":
        pos, vel, mass, ptype, u = ics.plummer_ics(20000, total_mass=1000.0,
                                                   a=500.0, g=43007.1)
        pos = pos + 25000.0
    elif which == "lcdm_gas":
        box = 50000.0
        pos, vel, mass, ptype, u = ics.lcdm_gas_ics(n_side=32, box=box,
                                                    hubble=0.1, g=43007.1)
    elif which == "disc":
        pos, vel, mass, ptype, u = ics.disc_ics(n_gas=20000)
    else:
        raise SystemExit(f"unknown workload {which}")

    n = len(pos)
    order = np.argsort(ptype, kind="stable")
    pos, vel, mass, ptype = pos[order], vel[order], mass[order], ptype[order]
    h = Header()
    for t in range(6):
        h.npart[t] = int((ptype == t).sum())
    h.npart_total = h.npart.copy()
    h.box_size = box
    snap = SnapshotData(
        header=h,
        pos=pos.astype(np.float32), vel=vel.astype(np.float32),
        ids=np.arange(1, n + 1, dtype=np.uint32),
        mass=mass.astype(np.float32),
        u=None if u is None else np.asarray(u, np.float32),
    )
    write_snapshot(out, snap, fmt=1)
    print(f"{which}: {n} particles -> {out}")


if __name__ == "__main__":
    main()
