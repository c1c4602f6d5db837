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


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_pow(x, p):
    """x**p with x clamped to >= 0 (reference uses pow on guarded positives)."""
    return jnp.maximum(x, 0.0) ** p
