"""Differentiable land physics: forward-mode sensitivities through the
full coupled water+energy step.

Because the entire timestep (``driver/step.advance``) is one pure JAX
function — including the masked iterative solvers (canopy stability
loop, hybrid secant+Brent photosynthesis, SNICAR sweeps, the banded
soil-temperature solve) — the model is machine-differentiable end to
end.  The reference (C++/Kokkos, ``/root/reference/src/physics``) has no
analog: perturbation studies there require hand-run finite differences.

Forward mode (``jax.jvp``) is used rather than reverse mode because
``lax.while_loop`` is forward-differentiable as-is (reverse mode would
need bounded-loop rewrites + rematerialization), and the typical use
case — d(all outputs)/d(one scalar perturbation) — is exactly one JVP.

Uses:
- flux sensitivities to forcing (e.g. dSH/dTbot: land-atmosphere
  coupling strength),
- parameter sensitivity / calibration Jacobians (e.g. d(fluxes)/d(soil
  texture or PFT traits)),
- tangent-linear runs for data assimilation.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu.driver import step as step_mod
from elmkernels_tpu.utils.dates import Date


class SensitivityResult(NamedTuple):
    """Primal trajectory and its directional derivative.

    ``diags``/``d_diags`` are :class:`StepDiagnostics` pytrees with a
    leading ``[nsteps]`` axis; ``state``/``d_state`` are the final
    :class:`ModelState` and its tangent.
    """
    state: object
    diags: object
    d_state: object
    d_diags: object


def _zero_tangent(tree):
    """Zero tangent pytree: zeros for inexact leaves, symbolic ``float0``
    tangents for integer leaves (as jax.jvp requires)."""
    from jax.dtypes import float0

    def z(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, dtype=float0)
    return jax.tree.map(z, tree)


def seed_field(name: str, value=1.0):
    """Seed helper: unit tangent in forcing/params field ``name``.

    Pass as ``seed_forcing=seed_field("tbot")`` for d/dT_atm (the
    forcing window holds 2 bracketing samples ``[2, ncol]``; both are
    seeded, i.e. a constant offset of the interpolated series), or
    ``seed_params=seed_field("watsat")`` for a soil-parameter direction.
    """
    def seed(primal, zeros):
        leaf = getattr(primal, name)
        return zeros._replace(**{name: jnp.full_like(leaf, value)})
    return seed


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _jvp_scan(land, psnveg, albveg, dtime, snicar, state, params,
              forc_stack, phen_stack, d_params, d_forc):
    """Shared jitted JVP of the scanned trajectory: one compile per
    (configuration, shapes, nsteps); the perturbation direction is data,
    so forcing/parameter seeds and finite-difference reruns all hit the
    same executable."""
    def scan_fn(params, forc_stack):
        def body(st, fp):
            f, p = fp
            st, d = step_mod.advance(land, psnveg, albveg, snicar,
                                     params, st, f, p, dtime)
            return st, d
        return jax.lax.scan(body, state, (forc_stack, phen_stack))
    return jax.jvp(scan_fn, (params, forc_stack), (d_params, d_forc))


def run_jvp(model, start: Date, nsteps: int,
            seed_forcing: Callable | None = None,
            seed_params: Callable | None = None,
            forc_stack=None, phen_stack=None) -> SensitivityResult:
    """Run ``nsteps`` from ``start`` and return the trajectory plus its
    directional derivative along a perturbation direction.

    The direction is given by ``seed_*(primal, zero_tangent) ->
    tangent`` callables (see :func:`seed_field`); the run computes
    d(outputs)/d(eps) for ``forcing + eps*tangent_f``, ``params +
    eps*tangent_p`` at eps=0 in ONE compiled forward pass.  Returns
    per-step :class:`StepDiagnostics` stacks and the final state, with
    tangents.  Does NOT mutate ``model.state``.  ``forc_stack``/
    ``phen_stack`` override the assembled windows (e.g. for
    finite-difference validation against a perturbed trajectory).
    """
    if forc_stack is None or phen_stack is None:
        forc_stack, phen_stack = model.stack_windows(start, nsteps)

    d_forc = _zero_tangent(forc_stack)
    if seed_forcing is not None:
        d_forc = seed_forcing(forc_stack, d_forc)
    d_params = _zero_tangent(model.params)
    if seed_params is not None:
        d_params = seed_params(model.params, d_params)

    (fin, diags), (d_fin, d_diags) = _jvp_scan(
        model.land, model.psnveg, model.albveg, model.dtime, model.snicar,
        model.state, model.params, forc_stack, phen_stack, d_params, d_forc)
    return SensitivityResult(fin, diags, d_fin, d_diags)
