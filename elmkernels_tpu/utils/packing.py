"""Packed scan-carry: fuse the state pytree's ~41 ``[ncol, k]`` leaves
into one contiguous ``[ncol, K]`` buffer per dtype across a ``lax.scan``
boundary.

Why: the r5 roofline (BASELINE.md) shows the production step's residual
device time dominated by ~45 small HBM<->VMEM ``copy-start/done`` pairs
per step — XLA's memory-space assignment staging every state leaf of the
scan carry individually around the loop boundary.  Packing the carry
into a handful of large buffers turns that staging into a few
bandwidth-bound copies instead of many latency-bound ones.

Exactness: packing is ``reshape`` + ``concatenate`` and unpacking is
``slice`` + ``reshape`` — no arithmetic touches the values.  The carry
contents are bit-identical; XLA may however fuse the *step body's*
epilogue differently against the pack concat, which can contract a
multiply-add differently.  Measured effect (CPU f64, 700 winter steps
incl. snow-layer creation): state bit-identical through ~600 steps,
then a single 3.7e-20 (tens-of-ulps) difference in one carried flux
(``qflx_dew_snow``) — the same last-ulp class as XLA's own
version-to-version fusion variation, far below the mixed-precision
modes' tested drift envelopes.  ``tests/test_packed_carry.py`` asserts
state bit-identity over short horizons on both scan layouts.

The reference has no analog: its state is ~150 separate Kokkos views
(``elm_state.h:52-225``) and its time loop is host-side, so nothing
crosses a compiled loop boundary there.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["pack_tree", "unpack_tree"]


def _widths(template):
    """Per-leaf trailing width (product of non-column dims)."""
    return [int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1
            else 1 for shape, _ in template]


def pack_tree(state) -> tuple:
    """Pack a NamedTuple of ``[ncol, ...]`` arrays into one ``[ncol, K]``
    buffer per dtype.  Returns a tuple of buffers in sorted-dtype-name
    order (a stable pytree structure for a scan carry)."""
    groups: dict[str, list] = {}
    for arr in state:
        k = int(np.prod(arr.shape[1:], dtype=np.int64)) if arr.ndim > 1 \
            else 1
        groups.setdefault(jnp.dtype(arr.dtype).name, []).append(
            arr.reshape(arr.shape[0], k))
    return tuple(jnp.concatenate(groups[name], axis=1)
                 for name in sorted(groups))


def unpack_tree(buffers: tuple, template, cls):
    """Inverse of :func:`pack_tree`.

    ``template`` is ``[(shape, dtype), ...]`` in field order (taken from
    the original state's avals at trace time); ``cls`` the NamedTuple
    type to rebuild."""
    order = sorted({jnp.dtype(dt).name for _, dt in template})
    offsets = {name: 0 for name in order}
    buf_by_name = dict(zip(order, buffers))
    leaves = []
    for (shape, dtype), k in zip(template, _widths(template)):
        name = jnp.dtype(dtype).name
        off = offsets[name]
        sl = buf_by_name[name][:, off:off + k]
        offsets[name] = off + k
        leaves.append(sl.reshape(shape))
    return cls(*leaves)
