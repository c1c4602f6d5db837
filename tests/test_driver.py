"""Integration test: the full coupled step over multiple days.

Mirrors the role of the reference's ``kokkos_driver.cc`` demo (100 steps,
prints prognostics) but *asserts* the conservation diagnostics the
reference only prints, plus physical-range sanity on the prognostics.
"""

import numpy as np
import pytest

from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date


@pytest.fixture(scope="module")
def model():
    return Model(ncol=4)


def test_driver_hundred_steps_conservation(model):
    errs = {"errh2o": [], "errh2o_led": [], "errh2osno": [], "errsol": [],
            "errlon": [], "errseb": []}

    def cb(date, state, diags):
        for k in errs:
            errs[k].append(np.asarray(getattr(diags, k)))

    # winter start (reference driver starts 1985-01-01 with 100 steps)
    model.run(Date.from_ymd(1985, 1, 1), 100, cb)

    state = model.state
    t = np.asarray(state.t_soisno)
    active = t != 0.0
    assert np.all(t[active] > 150.0) and np.all(t[active] < 350.0)
    assert np.all(np.asarray(state.h2osno) >= 0.0)
    assert np.all(np.asarray(state.h2osoi_liq) >= 0.0)
    assert np.all(np.asarray(state.snl) >= 0)
    assert np.all(np.isfinite(np.asarray(state.t_grnd)))

    # conservation contract of the PRODUCTION DEFAULT (mixed radiation:
    # f32 SNICAR/two-stream inside the f64 step): the shortwave closure
    # carries f32 roundoff (~1e-6 W/m2; pure-f64 closes to 1e-13, see
    # test_mixed_radiation.py), longwave/snow closures stay exact
    assert np.max(np.abs(errs["errsol"])) < 1e-5
    assert np.max(np.abs(errs["errlon"])) < 1e-8
    assert np.max(np.abs(errs["errh2osno"])) < 1e-7
    # column water balance is open to the (external) hydrology model —
    # the reference exposes qflx_top_soil/qflx_rootsoi as ATS exchange
    # fluxes — so errh2o is the un-modeled exchange, bounded per step
    # (tight: the snowc-filter fix removed the reference's layerless-pack
    # wipe-out, see step.py around combine_layers)
    assert np.max(np.abs(errs["errh2o"])) < 0.1
    # the closed ledger (errh2o re-charged with the debits the step
    # actually applied + explicit exchange-flux exports) is exact to
    # rounding — measured 4.4e-13 over 500 winter steps
    assert np.max(np.abs(errs["errh2o_led"])) < 1e-9
    # surface energy balance carries the reference's dropped-linearization
    # quirk (surface_fluxes_impl.hh:182: pow(emg*sigma*T0, 3) instead of
    # emg*sigma*T0**3), so errseb ~ 4*emg*sigma*T0^3*tinc; it must stay
    # bounded and mirror the soil-side residual
    errseb = np.asarray(errs["errseb"])
    assert np.max(np.abs(errseb)) < 300.0
    assert abs(errseb[-1]).max() < 60.0
    # the blanket bound above covers cold-start/snow-event transients
    # only; in steady operation the linearization residual is O(0.1)
    # W/m2, so the run's median must stay small — a real ~10 W/m2
    # energy bug cannot hide under the transient bound
    assert np.median(np.abs(errseb[20:])) < 5.0

    # all columns identical inputs -> identical state
    h = np.asarray(state.h2osno)
    assert np.allclose(h, h[0])


def test_layerless_pack_survives_combine(model):
    """Regression: the reference's extracted combine_layers lost ELM's
    snowc filter and silently zeroes a layerless pack (snl == 0,
    h2osno > 0) with no compensating flux (snow_hydrology_impl.hh:
    758-815). The driver restores the filter; a winter run through the
    thin-pack regime must keep errh2o small and never lose >0.5 mm of
    pack in one step without a recorded exchange flux."""
    m = Model(ncol=2)
    hist = []

    def cb(date, state, diags):
        hist.append((float(state.h2osno[0]), float(diags.errh2o[0]),
                     float(diags.qflx_top_soil[0]
                           + diags.qflx_sl_top_soil[0]
                           + diags.qflx_snow2topsoi[0]) * 1800.0))

    # day 2.3 onward is the synthetic forcing's first snow event; pack
    # oscillates snl 0 <-> 3 around day 2.7-3.0 (layer creation at
    # density < 50 kg/m3 dissolves immediately)
    m.run(Date.from_ymd(1985, 1, 3), 120, cb)
    h2osno = np.array([h[0] for h in hist])
    errh2o = np.array([h[1] for h in hist])
    outflux = np.array([h[2] for h in hist])
    assert h2osno.max() > 1.0, "forcing no longer produces a snow pack"
    drops = h2osno[:-1] - h2osno[1:]
    unexplained = drops - outflux[1:]
    assert np.max(np.abs(errh2o)) < 0.1
    assert np.max(unexplained) < 0.5


def test_driver_summer_melt(model):
    """A summer run should produce daytime shortwave absorption and
    non-trivial fluxes."""
    m = Model(ncol=4, lat_deg=40.0, lon_deg=255.0)
    diags = m.run(Date.from_ymd(1985, 7, 1), 48)
    assert np.all(np.isfinite(np.asarray(diags.eflx_sh_tot)))
    assert np.asarray(diags.fsa).max() >= 0.0


def test_elm_correct_seb_closes_energy_balance():
    """The reference drops the linearization factor in eflx_soil_grnd
    (pow(emg*sigma*T0, 3) instead of emg*sigma*T0**3,
    surface_fluxes_impl.hh:182), leaving errseb ~ 4*emg*sigma*T0^3*tinc.
    With elm_correct_seb=True the surface energy balance closes to
    rounding after the cold-start transient (the step-0 residual is the
    genuine O(tinc^2) remainder of linearizing T^4 while the cold-start
    temperature profile relaxes)."""
    m = Model(ncol=2, elm_correct_seb=True)
    hist = []
    m.run(Date.from_ymd(1985, 1, 1), 60,
          lambda d, s, x: hist.append(
              float(np.max(np.abs(np.asarray(x.errseb))))))
    assert max(hist[40:]) < 1e-9, max(hist[40:])
    # and the default stays reference-exact: same window shows the quirk
    m2 = Model(ncol=2)
    hist2 = []
    m2.run(Date.from_ymd(1985, 1, 1), 60,
           lambda d, s, x: hist2.append(
               float(np.max(np.abs(np.asarray(x.errseb))))))
    assert max(hist2[40:]) > 1e-3


def test_southern_hemisphere_winter():
    """Southern-latitude columns must survive a winter start: the
    reference's day_length.cc:30 clamp typo makes max_dayl = 0 south of
    the equator and dayl_factor = 0/0 = NaN (every southern column
    NaN'd within ~1 simulated day).  The production default fixes the
    clamp (PARITY.md); this pins real daylengths at all latitudes."""
    import jax.numpy as jnp
    from elmkernels_tpu.physics import solar

    decl_jan = solar.declination_angle_sin(jnp.asarray(10.0))
    lat = jnp.radians(jnp.asarray([-55.0, -20.0, 0.0, 40.0, 71.3]))
    dayl = np.asarray(solar.daylength(lat, decl_jan))
    mx = np.asarray(solar.max_daylength(lat))
    # January: long days in the south, short in the north, all finite
    assert np.all(np.isfinite(dayl)) and np.all(mx > 0.0)
    assert dayl[0] > 16 * 3600 and dayl[3] < 12 * 3600
    assert np.all(dayl <= mx + 1e-6)
    # the quirk (golden parity mode) reproduces the broken values
    mx_q = np.asarray(solar.max_daylength(lat, elm_clamp_quirk=True))
    assert mx_q[0] == 0.0  # southern max_dayl collapses under the quirk

    m = Model(ncol=3, lat_deg=-40.0, lon_deg=30.0)
    d = m.run_scan(Date.from_ymd(1985, 1, 1), 96)
    assert np.all(np.isfinite(np.asarray(m.state.t_grnd)))
    assert np.all(np.isfinite(np.asarray(m.state.t_veg)))
    assert float(np.abs(np.asarray(d.errh2o_led_max)).max()) < 1e-9


def test_rain_on_layerless_pack_ledger():
    """Rain falling on a LAYERLESS melting snowpack must leave the
    closed ledger at rounding (VERDICT r4 item 10 payoff: the r5 year
    run tripped at day 29 with led = exactly -fse*rain*dt over 55
    tropical columns — the r4 `dbl_rain` term corrected the layerless
    rain double-count a second time, replacing the +fse*rain error it
    fixed with an equal -fse*rain one; single-column decomposition in
    the r5 log).  Drives exact rain through a stub forcing provider
    onto a hand-built thin layerless pack pinned at the melting point.
    """
    import jax.numpy as jnp

    from elmkernels_tpu.data.state import StepForcing

    ncol = 2

    class RainForcing:
        qbot_is_rh = False
        dt_forcing = 1800.0

        def window(self, date, dtime):
            def pair(v):
                return np.full((2, ncol), v)
            return StepForcing(
                wt1=1.0, wt2=0.0, tbot=pair(276.0), pbot=pair(98000.0),
                qbot=pair(0.005), flds=pair(320.0), wind=pair(3.0),
                fsds=np.zeros(ncol), prec=np.full(ncol, 2.5e-5),
                decday=date.decimal_doy() + 1.0)

    m = Model(ncol=ncol, lat_deg=-12.5, lon_deg=344.2)
    m.forcing = RainForcing()
    # thin layerless pack (snl=0, h2osno>0) at the melting point, so
    # phase change melts it while rain lands on it — the day-29 regime
    st = m.state
    m.state = st._replace(
        h2osno=jnp.full(ncol, 1.2), snow_depth=jnp.full(ncol, 0.012),
        frac_sno=jnp.full(ncol, 0.55), frac_sno_eff=jnp.full(ncol, 0.55),
        int_snow=jnp.full(ncol, 6.7),
        t_grnd=jnp.full(ncol, 273.15),
        t_soisno=jnp.asarray(np.concatenate(
            [np.full((ncol, 5), 273.15),
             np.asarray(st.t_soisno)[:, 5:]], axis=1)))

    date = Date.from_ymd(1985, 1, 29, 6 * 3600)
    led_max = 0.0
    rain_on_layerless = False
    for _ in range(12):
        d = m.advance(date)
        led_max = max(led_max, float(np.abs(np.asarray(d.errh2o_led)).max()))
        if (int(np.asarray(m.state.snl).max()) == 0
                and float(np.asarray(m.state.h2osno).max()) > 0.0):
            rain_on_layerless = True
        date.increment_seconds(int(m.dtime))

    assert rain_on_layerless  # the regime was actually exercised
    assert led_max < 1e-9, led_max
