"""Multi-chip layer — the rebuild of the reference's MPI domain
decomposition [G2: domain.c, gravtree.c export/import] as JAX sharding.

The reference's machinery (Peano-Hilbert segment assignment, pairwise
MPI_Sendrecv export buffers, FFTW slab transposes) collapses into:

* a 1-D ``jax.sharding.Mesh`` over the chips (axis "shard");
* particle arrays sharded along N (``NamedSharding(P("shard"))``) — the
  static analog of domain decomposition; Morton sort keeps shards
  spatially coherent;
* XLA GSPMD inserting collectives (psum/all_gather/all_to_all over ICI)
  for the cross-shard interactions — the export/evaluate/return pattern
  becomes compiler-inserted communication (SURVEY.md §5 backend mapping);
* hand-written ``shard_map`` + ``ppermute`` ghost exchange for the hot
  paths where GSPMD's choice is suboptimal (the owner-computes slab
  step in ``parallel.spmd``; see ``spmd._ghost_exchange``).
"""

from gadget_leicester_tpu.parallel.mesh import (make_mesh, shard_state,
                                                replicate_state)
