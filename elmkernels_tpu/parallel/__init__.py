"""Device-mesh sharding for the column axis.

The reference's only parallel axis is the gridcell-column batch (MPI rank =
lat/lon block, zero inter-rank physics communication — SURVEY.md §2e).  The
TPU-native equivalent: shard every [ncol, ...] array over a 1-D device mesh
with ``NamedSharding(mesh, P("col", ...))``; physics needs no collectives
(halo-free), diagnostics reduce with ``psum``-style cross-device reductions
that XLA inserts automatically from replicated-output jits.
"""

from elmkernels_tpu.parallel.mesh import (column_mesh, shard_params,
                                          shard_state)

__all__ = ["column_mesh", "shard_state", "shard_params"]
