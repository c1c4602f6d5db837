"""Shared helpers for golden-file physics tests."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def batch(block: dict[str, np.ndarray], name: str, n: int = 1) -> jnp.ndarray:
    """Lift a golden-file variable to a batched [ncol=n, ...] jax array."""
    v = np.asarray(block[name], dtype=np.float64)
    if v.ndim == 0:
        return jnp.broadcast_to(jnp.asarray(v), (n,))
    return jnp.broadcast_to(jnp.asarray(v), (n,) + v.shape)


def batch_int(block: dict[str, np.ndarray], name: str, n: int = 1) -> jnp.ndarray:
    v = np.asarray(block[name])
    iv = v.astype(np.int32)
    if iv.ndim == 0:
        return jnp.broadcast_to(jnp.asarray(iv), (n,))
    return jnp.broadcast_to(jnp.asarray(iv), (n,) + iv.shape)


def unbatch(x) -> np.ndarray:
    """Column 0 of a batched array, as numpy."""
    return np.asarray(x)[0]
