"""ELMKernels-TPU: a TPU-native land-surface physics framework.

A from-scratch JAX/XLA rebuild of the capabilities of CANGA/ELMKernels
(E3SM Land Model physics kernels): the full land-surface water and energy
cycle for batches of independent soil columns, built batch-first so every
kernel operates on ``[ncol, ...]`` arrays and shards the column axis over a
TPU device mesh.

Layout (mirrors the reference's layer map, SURVEY.md §1):

- :mod:`elmkernels_tpu.constants` — physical constants / dims / PFT indices
  (reference: ``src/data/elm_constants.h``).
- :mod:`elmkernels_tpu.physics` — pure batched physics functions
  (reference: ``src/physics/*``).
- :mod:`elmkernels_tpu.data` — state pytrees + forcing/phenology/param
  ingest (reference: ``src/data/*``).
- :mod:`elmkernels_tpu.utils` — calendar, golden-file IO, domain decomposition
  (reference: ``src/utils/*``).
- :mod:`elmkernels_tpu.driver` — the jitted ``advance`` step + model API
  (reference: ``driver/kokkos/*``).
- :mod:`elmkernels_tpu.parallel` — mesh/sharding helpers (replaces MPI).

There is deliberately no custom-kernel (Pallas) package: round-2/3
profiling showed the production solver paths are best served by pure
XLA for both dtypes (Mosaic has no f64, and the experimental f32 ci
kernel failed to legalize on v5e) — see BASELINE.md roofline notes.
"""

__version__ = "0.1.0"
