"""Checkpoint / restore of the model state.

The reference has no checkpoint files; its ``PrimaryVars`` snapshot
(``/root/reference/src/data/elm_state.h:15-48``, "primary variables that
need to be saved in case of convergence issues") defines the minimal
prognostic set, which :class:`elmkernels_tpu.data.state.ModelState`
supersets.  Here the full state pytree is serialized with orbax (sharded
arrays round-trip per device), giving the restart capability the reference
lacks.
"""

from __future__ import annotations

import jax

from elmkernels_tpu.data.state import ModelState


def save(path: str, state: ModelState) -> None:
    """Write a checkpoint directory (orbax PyTree checkpoint)."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state._asdict(), force=True)


def restore(path: str, like: ModelState | None = None) -> ModelState:
    """Read a checkpoint; ``like`` provides sharding/layout targets for a
    distributed restore."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(
                ocp.utils.to_shape_dtype_struct
                if hasattr(ocp.utils, "to_shape_dtype_struct") else
                (lambda x: x), like._asdict())
            try:
                restored = ckptr.restore(path, item=like._asdict())
            except TypeError:
                restored = ckptr.restore(path)
        else:
            restored = ckptr.restore(path)
    return ModelState(**restored)


def primary_vars(state: ModelState) -> dict:
    """The reference's PrimaryVars restart subset (``elm_state.h:17-48``),
    for host-model (ATS-style) snapshot/exchange."""
    names = ["snl", "snow_depth", "frac_sno", "int_snow", "snw_rds",
             "h2osoi_liq", "h2osoi_ice", "h2osoi_vol", "h2ocan", "h2osno",
             "h2osfc", "t_soisno", "t_grnd", "t_h2osfc", "dz", "z", "zi"]
    return {k: getattr(state, k) for k in names}
