"""Cross-device diagnostic reductions.

Replaces the reference's MPI ``min_max_sum`` diagnostics
(``/root/reference/src/utils/utils.hh:45-103``, ``kokkos_utils.hh``): with
the column axis sharded over the mesh, a jitted global reduction compiles
to an on-device partial reduce + ICI all-reduce inserted by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MinMaxSum(NamedTuple):
    min: jnp.ndarray
    max: jnp.ndarray
    sum: jnp.ndarray


@jax.jit
def min_max_sum(x) -> MinMaxSum:
    """Global min/max/sum of a (possibly sharded) column array; XLA lowers
    the cross-shard combine to ICI collectives."""
    return MinMaxSum(jnp.min(x), jnp.max(x), jnp.sum(x))


@jax.jit
def min_max_mean(x) -> MinMaxSum:
    return MinMaxSum(jnp.min(x), jnp.max(x), jnp.mean(x))
