"""Batched land-surface physics kernels.

Every function here is pure, operates on ``[ncol]`` / ``[ncol, nlev]``
jax arrays (column axis leading), and is written branch-free with
``jnp.where`` masking so XLA can fuse whole physics groups into a few
TPU kernels — the TPU-native replacement for the reference's per-column
free functions dispatched by Kokkos ``parallel_for``
(reference: ``src/physics/*``, ``driver/kokkos/*_kokkos.cc``).
"""
