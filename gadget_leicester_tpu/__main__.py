"""CLI driver — `python -m gadget_leicester_tpu param.txt [restartflag]`,
the rebuild of `mpirun -np K Gadget2 param.txt [restartflag]` [G2: main.c].

restartflag: 0 (default) cold start from InitCondFile; 1 resume from
restart dump; 2 start from a snapshot file.
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="gadget_leicester_tpu",
        description="TPU-native GADGET: TreePM N-body + SPH")
    ap.add_argument("paramfile", help="GADGET parameter file")
    ap.add_argument("restartflag", nargs="?", type=int, default=0,
                    choices=[0, 1, 2])
    ap.add_argument("--max-steps", type=int, default=1000000)
    ap.add_argument("--pmgrid", type=int, default=0,
                    help="PM mesh size (the -DPMGRID compile flag analog)")
    ap.add_argument("--cooling", default="none",
                    choices=["none", "beta", "stamatellos"])
    ap.add_argument("--sinks", action="store_true")
    ap.add_argument("--isothermal", action="store_true")
    args = ap.parse_args(argv)

    from gadget_leicester_tpu.core.config import (SimOptions,
                                                  read_parameter_file)
    from gadget_leicester_tpu.models.simulation import Simulation

    cfg = read_parameter_file(args.paramfile)
    opts = SimOptions(
        periodic=bool(cfg.periodic_boundaries_on),
        pmgrid=args.pmgrid,
        cooling=args.cooling,
        sinks=args.sinks,
        isotherm_eqs=args.isothermal,
    )
    sim = Simulation.from_param_file(args.paramfile, opts,
                                     restart_flag=args.restartflag)
    print(f"N={int(sim.state.p.alive.sum())} particles; "
          f"t={sim.time:g} -> {cfg.time_max:g}; "
          f"gravity={opts.gravity_mode}, pmgrid={opts.pmgrid}")
    sim.run(max_steps=args.max_steps)
    print(f"done: {sim.step_count} steps, t={sim.time:g}, "
          f"{sim.snapshot_count} snapshots in {cfg.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
