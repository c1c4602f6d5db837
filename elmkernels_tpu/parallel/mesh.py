"""Mesh construction and pytree sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def column_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices with axis name 'col'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=("col",))


def _col_spec(mesh: Mesh, x):
    return NamedSharding(mesh, P("col", *([None] * (np.ndim(x) - 1))))


def shard_state(mesh: Mesh, state):
    """Place a ModelState (all arrays [ncol, ...]) onto the mesh, sharded
    along the column axis."""
    return jax.device_put(
        state, jax.tree.map(lambda x: _col_spec(mesh, x), state))


def shard_params(mesh: Mesh, params, ncol: int):
    """Per-column parameter arrays shard on 'col'; lookup tables and
    scalars replicate."""
    def placement(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] == ncol:
            return _col_spec(mesh, x)
        return NamedSharding(mesh, P())
    return jax.device_put(params, jax.tree.map(placement, params))


def shard_forcing(mesh: Mesh, forc, ncol: int):
    """StepForcing: [ncol] and [2, ncol] arrays shard on the column axis;
    scalar weights replicate."""
    def placement(x):
        if np.ndim(x) == 1 and np.shape(x)[0] == ncol:
            return _col_spec(mesh, x)
        if np.ndim(x) == 2 and np.shape(x)[1] == ncol:
            return NamedSharding(mesh, P(None, "col"))
        return NamedSharding(mesh, P())
    return jax.device_put(forc, jax.tree.map(placement, forc))
