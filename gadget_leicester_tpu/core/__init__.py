"""Core layer (L0): configuration, units, cosmology, timeline, state pytrees.

Rebuild of the reference's global-state layer [G2: allvars.h/allvars.c,
begrun.c :: read_parameter_file(), driftfac.c] as typed dataclasses and
precomputed JAX-friendly tables instead of a mutable global ``All`` struct.
"""
