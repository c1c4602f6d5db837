"""Forward-mode differentiability of the full coupled step.

The tangent-linear model (jax.jvp through driver/step.advance, incl. the
masked while-loop solvers and the banded soil solve) is validated against
central finite differences of the primal trajectory.  This capability has
no counterpart in the reference.

All subtests share ONE compiled executable (the JVP of the scanned
trajectory): the perturbation direction is data, and finite differences
re-run the same executable with perturbed forcing and zero seed.
"""

import jax
import numpy as np
import pytest

from elmkernels_tpu.driver import sensitivity as sens
from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date

NSTEPS = 2
START = Date.from_ymd(1985, 7, 1, 6 * 3600)


@pytest.fixture(scope="module")
def model():
    # pure-f64 radiation: finite differences at h ~ 1e-3 would otherwise
    # carry the mixed-radiation default's f32 roundoff as FD noise
    return Model(ncol=2, lat_deg=40.0, lon_deg=255.0,
                 mixed_radiation=False)


@pytest.fixture(scope="module")
def windows(model):
    return model.stack_windows(START, NSTEPS)


@pytest.mark.slow
def test_forcing_jvp_matches_fd(model, windows):
    """d(fluxes)/d(T_atm): JVP vs central differences at h = 1 mK."""
    forc, phen = windows
    res = sens.run_jvp(model, START, NSTEPS,
                       seed_forcing=sens.seed_field("tbot"),
                       forc_stack=forc, phen_stack=phen)

    h = 1e-3
    hi = sens.run_jvp(model, START, NSTEPS,
                      forc_stack=forc._replace(tbot=forc.tbot + h),
                      phen_stack=phen)
    lo = sens.run_jvp(model, START, NSTEPS,
                      forc_stack=forc._replace(tbot=forc.tbot - h),
                      phen_stack=phen)
    fd = jax.tree.map(lambda a, b: (np.asarray(a) - np.asarray(b))
                      / (2.0 * h), hi.diags, lo.diags)

    for name in ("eflx_sh_tot", "eflx_lh_tot", "t_ref2m",
                 "eflx_lwrad_out"):
        got = np.asarray(getattr(res.d_diags, name))
        want = np.asarray(getattr(fd, name))
        assert np.all(np.isfinite(got)), name
        # a warmer atmosphere must warm the 2m diagnostic
        if name == "t_ref2m":
            assert np.all(got > 0.0)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4,
                                   err_msg=name)


def test_param_jvp_finite_and_plausible(model, windows):
    """d(fluxes)/d(watsat) (soil porosity direction): finite tangents that
    propagate into the state; primal untouched by seeding (eps = 0)."""
    forc, phen = windows
    res = sens.run_jvp(model, START, NSTEPS,
                       seed_params=sens.seed_field("watsat"),
                       forc_stack=forc, phen_stack=phen)
    # (integer diagnostics carry symbolic float0 tangents — skip them)
    leaves = [np.asarray(l) for l in jax.tree.leaves(res.d_diags)]
    assert all(np.all(np.isfinite(l)) for l in leaves
               if np.issubdtype(l.dtype, np.floating))
    # porosity enters soil thermal conductivity/heat capacity: ground
    # temperature tangent must be non-zero by the end of the window
    assert np.any(np.asarray(res.d_state.t_grnd) != 0.0)
    base = sens.run_jvp(model, START, NSTEPS, forc_stack=forc,
                        phen_stack=phen)
    np.testing.assert_array_equal(np.asarray(res.diags.eflx_sh_tot),
                                  np.asarray(base.diags.eflx_sh_tot))


def test_state_tangent_propagates(model, windows):
    """Forcing perturbations must accumulate into prognostic state
    tangents (the tangent-linear model is not trivially zero)."""
    forc, phen = windows
    res = sens.run_jvp(model, START, NSTEPS,
                       seed_forcing=sens.seed_field("tbot"),
                       forc_stack=forc, phen_stack=phen)
    assert np.any(np.asarray(res.d_state.t_soisno) != 0.0)
    assert np.all(np.isfinite(np.asarray(res.d_state.t_soisno)))
