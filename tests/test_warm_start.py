"""Warm-started canopy stability / ci solvers (opt-in perf mode).

``warm_start=True`` seeds the stability loop's Monin-Obukhov length and
the photosynthesis ci solve from the previous step's converged values
(state carries ``obu_can``/``ci_sun``/``ci_sha``).  The converged
physics must track the reference-exact cold-start trajectory within
solver tolerance, conservation must hold, and the mean canopy iteration
count must drop (the whole point).  VERDICT r2 item 6.
"""

import jax
import numpy as np

from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date

NSTEPS = 48  # one full simulated day per scan; the test runs two
#              back-to-back (same compiled executable), crossing the
#              day/night transitions where cold-start iteration counts
#              spike (BASELINE.md scan-vs-steady gap)

PROGNOSTICS = ("t_veg", "t_grnd", "t_soisno", "h2osno", "h2ocan",
               "h2osoi_liq", "h2osoi_ice", "snl", "t_h2osfc")


def _run(warm):
    m = Model(ncol=3, lat_deg=40.0, lon_deg=255.0, warm_start=warm)
    d1 = m.run_scan(Date.from_ymd(1985, 7, 1), NSTEPS)
    day1 = {k: np.asarray(getattr(m.state, k)) for k in PROGNOSTICS}
    d2 = m.run_scan(Date.from_ymd(1985, 7, 2), NSTEPS)
    cat = jax.tree.map(lambda a, b: np.concatenate(
        [np.asarray(a), np.asarray(b)]), d1, d2)
    return m, day1, cat


def test_warm_start_tracks_cold_and_iterates_less():
    m_cold, day1_cold, d_cold = _run(False)
    m_warm, day1_warm, d_warm = _run(True)

    # warm_start is trajectory-neutral at the solver's own variables to
    # the BIT over a full simulated day: the canopy Newton iterates
    # t_veg to dtmin and the Monin-Obukhov length to its fixed point
    # regardless of where the inner ci solve was seeded, so t_veg /
    # obu_can / the snowpack land on identical bits.  The ci root
    # itself converges only to secant tolerance, so the downstream
    # transpiration/ground-flux chain (t_grnd, t_soisno, soil water)
    # carries a ~1e-6-level echo of the seed — solver tolerance, not
    # drift.  These exact assertions are the promotion argument for
    # the production default; the iteration asserts below prove the
    # flag is live (a dead flag would pass neutrality trivially but
    # fail the iteration drop).
    for name in ("t_veg", "h2osno", "snl"):
        assert np.array_equal(day1_cold[name], day1_warm[name]), name
    assert np.array_equal(np.asarray(m_cold.state.obu_can),
                          np.asarray(m_warm.state.obu_can))
    for name in PROGNOSTICS:
        d = np.max(np.abs(day1_cold[name] - day1_warm[name]))
        assert d < 1e-5, (name, d)

    # over longer horizons the ci-tolerance echo compounds slightly;
    # still bounded far below signal after day 2
    for name in PROGNOSTICS:
        a = np.asarray(getattr(m_cold.state, name))
        b = np.asarray(getattr(m_warm.state, name))
        assert np.max(np.abs(a - b)) < 0.05, name

    # conservation contract unchanged
    assert float(np.abs(np.asarray(d_warm.errh2o_led_max)).max()) < 1e-9
    assert float(np.abs(np.asarray(d_warm.errsol_max)).max()) < 1e-5
    assert float(np.abs(np.asarray(d_warm.errh2osno_max)).max()) < 1e-7

    # the perf claim: the inner ci secant iterations drop (the outer
    # Newton count is dominated by itmin and already warm via t_veg in
    # state; the solver work lives in the inner loops)
    it_cold = float(np.asarray(d_cold.niters_ci_mean).mean())
    it_warm = float(np.asarray(d_warm.niters_ci_mean).mean())
    assert it_warm < 0.8 * it_cold, (it_warm, it_cold)
    # and the outer count never grows
    assert (float(np.asarray(d_warm.niters_canopy_mean).mean())
            <= float(np.asarray(d_cold.niters_canopy_mean).mean()) + 0.1)

    # fluxes track closely
    np.testing.assert_allclose(np.asarray(d_warm.eflx_sh_mean),
                               np.asarray(d_cold.eflx_sh_mean),
                               rtol=0.02, atol=1.0)


def test_warm_state_carries_are_populated():
    """Even with warm_start off the converged roots land in state, so
    a restart can switch warm_start on."""
    m = Model(ncol=2, lat_deg=40.0, lon_deg=255.0,
              warm_start=False)
    m.run(Date.from_ymd(1985, 7, 1, 6 * 3600), 20)
    assert np.any(np.asarray(m.state.ci_sun) > 0.0)
    assert np.any(np.asarray(m.state.obu_can) != 0.0)
