"""Mixed-precision canopy loop (production default since r4): the
stability-loop interior —
the roofline-named 1.2 ms/step emulated-f64 hotspot (BASELINE.md
roofline r3) — runs in f32 with f64 prognostic handoff.

Contract mirrors mixed radiation: the water ledger stays exact (the
step debits the same upcast fluxes it charges), non-canopy closures are
untouched, and the trajectory tracks the f64 loop within the loop's own
convergence tolerance (0.01 K / 0.1 W/m2 — far above f32 roundoff; the
full-f32 configuration's 15-day drift bounds this subset's risk)."""

import numpy as np

from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date

NSTEPS = 96  # 2 days across day/night transitions


def test_mixed_canopy_tracks_f64():
    start = Date.from_ymd(1985, 7, 1)
    m_ref = Model(ncol=3, lat_deg=40.0, lon_deg=255.0,
                  mixed_canopy=False, warm_start=False)
    m_mix = Model(ncol=3, lat_deg=40.0, lon_deg=255.0,
                  mixed_canopy=True, warm_start=False)
    d_ref = m_ref.run_scan(start, NSTEPS)
    d_mix = m_mix.run_scan(start, NSTEPS)

    # ledger exact, radiation closures untouched by the canopy demotion
    assert float(np.abs(np.asarray(d_mix.errh2o_led_max)).max()) < 1e-9
    assert float(np.abs(np.asarray(d_mix.errlon_max)).max()) < 1e-8
    assert float(np.abs(np.asarray(d_mix.errh2osno_max)).max()) < 1e-7
    assert float(np.abs(np.asarray(d_mix.errsol_max)).max()) < 1e-5

    # state drift stays within solver tolerance, far below signal
    for name in ("t_veg", "t_grnd", "t_soisno", "h2osno", "h2ocan",
                 "h2osoi_liq"):
        a = np.asarray(getattr(m_ref.state, name))
        b = np.asarray(getattr(m_mix.state, name))
        assert np.max(np.abs(a - b)) < 0.05, name

    # fluxes track
    np.testing.assert_allclose(np.asarray(d_mix.eflx_sh_mean),
                               np.asarray(d_ref.eflx_sh_mean),
                               rtol=0.02, atol=1.0)
    np.testing.assert_allclose(np.asarray(d_mix.eflx_lh_mean),
                               np.asarray(d_ref.eflx_lh_mean),
                               rtol=0.05, atol=1.0)
    # everything finite through the f32 loop
    assert np.all(np.isfinite(np.asarray(m_mix.state.t_veg)))


def test_mixed_canopy_with_warm_start_tracks_f64():
    """The stacked perf config (f32 canopy loop + warm-started solvers —
    4.21 ms/step, 1.94M col/s on v5e, BASELINE.md r3) must satisfy the
    same contract jointly."""
    start = Date.from_ymd(1985, 7, 1)
    m_ref = Model(ncol=3, lat_deg=40.0, lon_deg=255.0,
                  mixed_canopy=False, warm_start=False)
    m_fast = Model(ncol=3, lat_deg=40.0, lon_deg=255.0,
                   mixed_canopy=True, warm_start=True)
    d_ref = m_ref.run_scan(start, NSTEPS)
    d_fast = m_fast.run_scan(start, NSTEPS)

    assert float(np.abs(np.asarray(d_fast.errh2o_led_max)).max()) < 1e-9
    assert float(np.abs(np.asarray(d_fast.errh2osno_max)).max()) < 1e-7
    assert float(np.abs(np.asarray(d_fast.errsol_max)).max()) < 1e-5
    for name in ("t_veg", "t_grnd", "t_soisno", "h2osno", "h2ocan"):
        a = np.asarray(getattr(m_ref.state, name))
        b = np.asarray(getattr(m_fast.state, name))
        assert np.max(np.abs(a - b)) < 0.05, name
    np.testing.assert_allclose(np.asarray(d_fast.eflx_sh_mean),
                               np.asarray(d_ref.eflx_sh_mean),
                               rtol=0.02, atol=1.0)
