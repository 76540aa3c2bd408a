"""Simulation drivers and physics orchestration (the reference's L6/L7/L9):
force computation ordering [G2: accel.c], drift/kick/timestep machinery
[G2: predict.c, timestep.c], the run loop [G2: run.c], and the Leicester
physics modules (cooling, sinks).
"""
