"""Utilities: diagnostics/energy statistics, logging, timers — the rebuild
of the reference's observability layer [G2: global.c, run.c :: every_timestep_stuff()].
"""
