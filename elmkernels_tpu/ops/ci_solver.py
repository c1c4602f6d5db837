"""Pallas TPU kernel for the hybrid secant/Brent intracellular-CO2 solve.

The per-column ci root solve (reference
``/root/reference/src/physics/photosynthesis_impl.hh:395-620``) runs
~30-40 residual evaluations per call, ~41 calls per model step, and its
XLA lowering pays a full loop-carry materialisation plus an any()-reduce
sync on every iteration — ~135 us per call at 16k columns for ~25 us of
vector work.  This kernel runs the *same* masked iteration (the shared
``hybrid_solve`` body from :mod:`elmkernels_tpu.physics.photosynthesis`,
``inkernel=True``) entirely in VMEM: the batch is tiled into
``block_rows x 128`` chunks, each grid program iterates its chunk to
convergence with in-kernel ``lax.while_loop``s, and the carry never
touches HBM.  Chunked early exit also recovers some of the reference's
per-column adaptivity: a chunk whose columns all converge (or sit in
night-time) stops iterating regardless of the worst column elsewhere.

f32 only — TPU f64 is emulated by XLA and unsupported in Mosaic; the
f64 (golden/correctness) path keeps the pure-JAX implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from elmkernels_tpu.physics.photosynthesis import (CiEnv, PsnOut,
                                                   hybrid_solve)

_LANES = 128
_N_ENV = len(CiEnv._fields)


def _kernel(mode: str, *refs):
    in_refs, out_refs = refs[:_N_ENV + 2], refs[_N_ENV + 2:]
    x0 = in_refs[0][:]
    env = CiEnv(*(r[:] for r in in_refs[1:_N_ENV + 1]))
    enabled = in_refs[_N_ENV + 1][:] > 0.5
    zero = jnp.zeros_like(x0)
    out0 = PsnOut(zero, zero, zero, zero, zero, zero)
    ci, out = hybrid_solve(x0, env, mode, enabled, out0, inkernel=True)
    for ref, val in zip(out_refs, (ci,) + tuple(out)):
        ref[:] = val


@functools.partial(jax.jit, static_argnames=("mode", "block_rows",
                                             "interpret"))
def ci_hybrid_solve(x0_init, env: CiEnv, mode: str,
                    enabled, *, block_rows: int = 32,
                    interpret: bool = False):
    """Pallas-accelerated ``hybrid_solve`` (out_init = zeros, the only
    configuration the model uses).  Returns ``(ci, PsnOut)``.

    Inputs are 1-D ``[n]`` f32 arrays (+ a bool ``enabled`` mask); ``n``
    is padded up to a whole number of ``block_rows x 128`` tiles with
    disabled columns (zero iterations, outputs sliced back to ``n``).
    """
    n = x0_init.shape[0]
    if x0_init.dtype != jnp.float32:
        raise TypeError("ci_hybrid_solve is f32-only; use hybrid_solve "
                        f"for {x0_init.dtype}")
    blk = block_rows * _LANES
    npad = -n % blk
    total = n + npad

    def prep(a, fill):
        a = a.astype(jnp.float32)
        if npad:
            a = jnp.pad(a, (0, npad), constant_values=fill)
        return a.reshape(total // _LANES, _LANES)

    ins = ([prep(x0_init, 1.0)]
           + [prep(v, 1.0) for v in env]
           + [prep(enabled.astype(jnp.float32), 0.0)])

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((total // _LANES, _LANES), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_kernel, mode),
        grid=(total // blk,),
        in_specs=[spec] * len(ins),
        out_specs=[spec] * 7,
        out_shape=[shape] * 7,
        interpret=interpret,
    )(*ins)
    flat = [o.reshape(total)[:n] for o in outs]
    return flat[0], PsnOut(*flat[1:])
