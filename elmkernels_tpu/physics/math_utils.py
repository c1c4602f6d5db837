"""Small numerical helpers shared by physics modules.

Because every branch of a ``jnp.where`` is evaluated on TPU, guarded
divisions/roots must be made safe *before* the select, or NaN/Inf from the
untaken branch poisons gradients and (with XLA fast-math) occasionally
values.  These helpers centralize that pattern.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_div(num, den, cond=None, fill=0.0):
    """num/den where ``cond`` (default ``den != 0``) holds, else ``fill``."""
    if cond is None:
        cond = den != 0.0
    den_safe = jnp.where(cond, den, 1.0)
    return jnp.where(cond, num / den_safe, fill)


def safe_tanh(x):
    """tanh that is safe under TPU emulated f64.

    On v5e the double-double tanh (a) overshoots 1.0 by up to ~1.4e-14
    near saturation and (b) has NO range reduction: tanh(88) returns
    0.0 and tanh(>=89) returns NaN (exp(2x) overflow inside the
    emulation; measured r4).  Snow-cover fractions built from it then
    feed (1-frac)^(1/n_melt) -> pow(negative) = NaN, killing every
    snowy column.  Clamp the input to |x| <= 40 (f64 tanh(|x|>=19.06)
    is exactly +-1.0, so this is bit-identical on every backend) and
    the output to [-1, 1].
    """
    return jnp.clip(jnp.tanh(jnp.clip(x, -40.0, 40.0)), -1.0, 1.0)


def take_layer(a, idx):
    """``a[n, L], idx[n] -> a[n, idx[n]]`` as a one-hot masked sum.

    XLA lowers ``take_along_axis`` on TPU to a flattened 1-D gather that
    serializes (~0.3 ms per call at [8k, 5] — measured); the one-hot
    select+reduce is a plain VPU op and bit-exact (exactly one term
    survives).  Out-of-range indices yield 0 rather than clamping.
    """
    L = a.shape[1]
    onehot = jnp.arange(L, dtype=idx.dtype)[None, :] == idx[:, None]
    return jnp.sum(jnp.where(onehot, a, 0), axis=1)


def gather_layers(a, idx):
    """``a[n, L], idx[n, K] -> out[n, k] = a[n, idx[n, k]]`` via one-hot
    contraction (see ``take_layer``).  Out-of-range indices yield 0."""
    L = a.shape[1]
    onehot = (idx[:, :, None]
              == jnp.arange(L, dtype=idx.dtype)[None, None, :])
    return jnp.sum(jnp.where(onehot, a[:, None, :], 0), axis=2)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_pow(x, p):
    """x**p with x clamped to >= 0 (reference uses pow on guarded positives)."""
    return jnp.maximum(x, 0.0) ** p
