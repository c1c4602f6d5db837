"""ATS-style host-model coupling surface (VERDICT r3 item 7).

Covers both coupling modes of ``driver/interface.MinimalInterface``
(reference ``minimal_elm_interface.cc:6-15``,
``interface_data_transfer.hh:6-127``):

- standalone ``advance`` (internal forcing managers);
- ``advance_with_forcing`` — host-provided, already-interpolated
  forcing/phenology (the ``input_containers.h:8-45`` structs);

plus the convergence-recovery round trip: host forcing with a NaN →
guard trips → restore → re-advance matches an undisturbed twin.
"""

import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.driver.interface import (HostForcing, HostPhenology,
                                             MinimalInterface)
from elmkernels_tpu.utils.dates import Date

NCOL = 3


def _host_inputs(iface, date):
    """Interpolate the interface's own synthetic managers host-side —
    playing the role of the ATS host model's forcing provider."""
    m = iface.model
    w = m.forcing.window(date, m.dtime)
    p = m.phenology.window(date)

    def interp(pair, wt1, wt2):
        return wt1 * np.asarray(pair[0]) + wt2 * np.asarray(pair[1])

    atm = HostForcing(
        atm_tbot=interp(w.tbot, w.wt1, w.wt2),
        atm_pbot=interp(w.pbot, w.wt1, w.wt2),
        atm_qbot=interp(w.qbot, w.wt1, w.wt2),
        atm_flds=interp(w.flds, w.wt1, w.wt2),
        atm_fsds=np.asarray(w.fsds), atm_prec=np.asarray(w.prec),
        atm_wind=interp(w.wind, w.wt1, w.wt2),
        atm_zbot=np.full(NCOL, 30.0))
    phen = HostPhenology(
        lai=interp(p.mlai, p.wt1, p.wt2), sai=interp(p.msai, p.wt1, p.wt2),
        htop=interp(p.mhtop, p.wt1, p.wt2),
        hbot=interp(p.mhbot, p.wt1, p.wt2))
    return atm, phen


def test_advance_exports_exchange_fluxes():
    iface = MinimalInterface(ncol=NCOL).setup()
    fl = iface.advance(Date.from_ymd(1985, 7, 1, 6 * 3600), 1800.0)
    assert fl.qflx_rootsoi.shape == (NCOL, c.NLEVGRND)
    for name in ("qflx_top_soil", "qflx_evap_tot", "eflx_sh_tot",
                 "eflx_lh_tot", "eflx_lwrad_out"):
        v = getattr(fl, name)
        assert v.shape == (NCOL,) and np.all(np.isfinite(v)), name


def test_host_forcing_matches_internal_managers():
    """Feeding the host pathway the internal managers' own interpolated
    values reproduces the internal-mode trajectory (the degenerate
    bracket makes the device-side time interpolation exact; remaining
    diff is host-numpy vs device interpolation rounding)."""
    date0 = Date.from_ymd(1985, 7, 1, 6 * 3600)
    a = MinimalInterface(ncol=NCOL).setup()
    b = MinimalInterface(ncol=NCOL).setup()

    date = date0.copy()
    for _ in range(8):
        fa = a.advance(date, 1800.0)
        atm, phen = _host_inputs(b, date)
        fb = b.advance_with_forcing(date, 1800.0, atm, phen)
        date.increment_seconds(1800)

    np.testing.assert_allclose(fb.eflx_sh_tot, fa.eflx_sh_tot,
                               rtol=1e-9, atol=1e-9)
    for name, va in zip(a.model.state._fields, a.model.state):
        vb = getattr(b.model.state, name)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-9, atol=1e-12, err_msg=name)


def test_host_forcing_shape_guard():
    iface = MinimalInterface(ncol=NCOL).setup()
    atm, phen = _host_inputs(iface, Date.from_ymd(1985, 7, 1))
    bad = atm._replace(atm_tbot=np.zeros(NCOL + 1))
    try:
        iface.advance_with_forcing(Date.from_ymd(1985, 7, 1), 1800.0,
                                   bad, phen)
    except ValueError as e:
        assert "shape" in str(e)
    else:
        raise AssertionError("mis-shaped host forcing accepted")


def test_host_forcing_recovery_roundtrip():
    """The convergence-recovery loop the reference sketches but never
    exercises (``elm_state.h:15-48``): host supplies forcing → receives
    fluxes → a poisoned step trips the guard → restore → re-advance
    with good forcing matches an undisturbed twin bit-for-bit."""
    from elmkernels_tpu.utils.guard import StepGuard

    date0 = Date.from_ymd(1985, 7, 1, 6 * 3600)
    iface = MinimalInterface(ncol=NCOL).setup()
    twin = MinimalInterface(ncol=NCOL).setup()

    date = date0.copy()
    atm, phen = _host_inputs(iface, date)
    iface.advance_with_forcing(date, 1800.0, atm, phen)
    twin.advance_with_forcing(date, 1800.0, atm, phen)
    date.increment_seconds(1800)

    # PrimaryVars API parity: the reference's snapshot subset round-trips
    pv = iface.get_primary_vars()
    assert set(pv) >= {"snl", "t_soisno", "h2osoi_liq", "h2osno", "dz"}

    snap = iface.snapshot()
    guard = StepGuard(ncol=NCOL)

    # host hands in a poisoned forcing field (e.g. an ATS NaN)
    import types
    atm2, phen2 = _host_inputs(iface, date)
    bad = atm2._replace(atm_tbot=np.asarray(atm2.atm_tbot) * np.nan)
    iface.advance_with_forcing(date, 1800.0, bad, phen2)
    clean_diags = types.SimpleNamespace(
        **{k: np.zeros(NCOL) for k in ("errh2o", "errh2o_led",
                                       "errh2osno", "errsol", "errseb")})
    rep = guard.check(iface.model.state, clean_diags)
    assert not rep.ok and any("non-finite" in r for r in rep.reasons)

    # restore + re-advance with the good forcing == the twin, exactly
    iface.restore(snap)
    iface.advance_with_forcing(date, 1800.0, atm2, phen2)
    twin.advance_with_forcing(date, 1800.0, atm2, phen2)
    for name, va in zip(twin.model.state._fields, twin.model.state):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(getattr(iface.model.state, name)),
            err_msg=name)
    # set_primary_vars restores the reference subset too
    iface.set_primary_vars(pv)
    np.testing.assert_array_equal(np.asarray(iface.model.state.t_soisno),
                                  np.asarray(pv["t_soisno"]))
