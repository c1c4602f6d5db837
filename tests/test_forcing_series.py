"""Production series-ingest layout from REAL NetCDF forcing files
(VERDICT r3 item 1): ``NetCDFForcing.series()`` must be bit-identical to
the per-step ``window()`` path, per-host reads must be hyperslabs whose
bytes scale with ncol_local, and the monthly aerosol stream must ride in
the series payload (reference ``atm_data_impl.hh:248-319``,
``read_input.cc:52-87``)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from make_forcing_files import write_months  # noqa: E402

from elmkernels_tpu.data.forcing import NetCDFForcing  # noqa: E402
from elmkernels_tpu.utils.dates import Date  # noqa: E402

NLAT, NLON = 3, 4
NCELL = NLAT * NLON


@pytest.fixture(scope="module")
def forcing_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("forc")
    base = str(d / "forc_")
    write_months(base, 1985, 6, 3, NLAT, NLON)  # Jun, Jul, Aug
    return base


def _series_vs_window(base, start, nsteps, ncol=NCELL, col0=0):
    """Assert series() rows gathered at idx1/idx1+1 equal window()'s
    bracketing samples bit-for-bit, with equal weights."""
    fa = NetCDFForcing(base, ncol, lat_r=np.zeros(ncol),
                       lon_r=np.zeros(ncol), col0=col0)
    fb = NetCDFForcing(base, ncol, lat_r=np.zeros(ncol),
                       lon_r=np.zeros(ncol), col0=col0)
    ser, steps = fa.series(start, nsteps, 1800.0)
    date = start.copy()
    for k in range(nsteps):
        w = fb.window(date, 1800.0)
        i = int(steps.idx1[k])
        np.testing.assert_array_equal(ser.tbot[i:i + 2], np.asarray(w.tbot))
        np.testing.assert_array_equal(ser.qbot[i:i + 2], np.asarray(w.qbot))
        np.testing.assert_array_equal(ser.fsds[i], np.asarray(w.fsds))
        np.testing.assert_array_equal(ser.prec[i], np.asarray(w.prec))
        assert float(steps.wt1[k]) == float(w.wt1)
        assert float(steps.wt2[k]) == float(w.wt2)
        assert float(steps.decday[k]) == float(w.decday)
        date.increment_seconds(1800)
    # payload is trimmed to the bracketed span (not the whole month)
    assert ser.tbot.shape[0] == int(steps.idx1.max()) + 2


def test_series_matches_window_in_month(forcing_dir):
    _series_vs_window(forcing_dir, Date.from_ymd(1985, 7, 10, 6 * 3600),
                      48)


def test_series_across_month_boundary(forcing_dir):
    # Jul 31 21:00 -> Aug 1: the series concatenates two month files,
    # deduping the bridge row against August's row 0
    _series_vs_window(forcing_dir, Date.from_ymd(1985, 7, 31, 21 * 3600),
                      24)


def test_series_ships_source_precision(forcing_dir, tmp_path):
    """Series payload rides at SOURCE precision: f32-on-disk variables
    (no scale/offset) ship as f32 — exactly the file's information
    content, half the H2D bytes — while f64-stored file sets keep f64;
    ship_source_dtype=False restores f64 shipping with an identical
    trajectory (the demote/promote round trip is value-exact, asserted
    in _series_vs_window against the f64 window() path)."""
    start = Date.from_ymd(1985, 7, 10, 6 * 3600)
    kw = dict(lat_r=np.zeros(NCELL), lon_r=np.zeros(NCELL))
    f32 = NetCDFForcing(forcing_dir, NCELL, **kw)
    ser32, _ = f32.series(start, 8, 1800.0)
    assert ser32.tbot.dtype == np.float32  # generator writes NC_FLOAT
    assert ser32.prec.dtype == np.float32

    off = NetCDFForcing(forcing_dir, NCELL, ship_source_dtype=False,
                        **kw)
    ser64, _ = off.series(start, 8, 1800.0)
    assert ser64.tbot.dtype == np.float64
    np.testing.assert_array_equal(ser32.tbot.astype(np.float64),
                                  ser64.tbot)

    base64 = str(tmp_path / "f64_")
    write_months(base64, 1985, 7, 1, NLAT, NLON, dtype=np.float64)
    f64 = NetCDFForcing(base64, NCELL, **kw)
    ser, _ = f64.series(start, 8, 1800.0)
    assert ser.tbot.dtype == np.float64  # f64 storage: nothing to save


def test_series_dt_forcing_probe(forcing_dir):
    f = NetCDFForcing(forcing_dir, NCELL, lat_r=np.zeros(NCELL),
                      lon_r=np.zeros(NCELL))
    assert f.dt_forcing == pytest.approx(3 * 3600.0)


def test_hyperslab_reads_match_full_grid(forcing_dir):
    """A sharded reader (col0 mid-grid, crossing a lat-row boundary)
    returns exactly the full reader's slice — per-host hyperslab reads,
    reference ``read_input.cc:52-87``."""
    full = NetCDFForcing(forcing_dir, NCELL, lat_r=np.zeros(NCELL),
                         lon_r=np.zeros(NCELL))
    date = Date.from_ymd(1985, 7, 2, 3 * 3600)
    wf = full.window(date, 1800.0)
    for col0, ncol in ((0, 4), (3, 5), (NCELL - 2, 2)):
        shard = NetCDFForcing(forcing_dir, ncol, lat_r=np.zeros(ncol),
                              lon_r=np.zeros(ncol), col0=col0)
        ws = shard.window(date, 1800.0)
        np.testing.assert_array_equal(np.asarray(ws.tbot),
                                      np.asarray(wf.tbot)[:, col0:col0 + ncol])
        np.testing.assert_array_equal(np.asarray(ws.fsds),
                                      np.asarray(wf.fsds)[col0:col0 + ncol])


def test_hyperslab_read_bytes_scale_with_shard(forcing_dir, monkeypatch):
    """The reader must request a start/count hyperslab covering only its
    rows, not the full grid (per-host read bytes ∝ ncol_local)."""
    from elmkernels_tpu.data import netcdf_io
    calls = []
    orig = netcdf_io.read_var

    def spy(path, name, start=None, count=None):
        calls.append((name, start, tuple(count) if count else None))
        return orig(path, name, start=start, count=count)

    monkeypatch.setattr(netcdf_io, "read_var", spy)
    shard = NetCDFForcing(forcing_dir, 4, lat_r=np.zeros(4),
                          lon_r=np.zeros(4), col0=4)  # lat row 1 exactly
    shard.window(Date.from_ymd(1985, 7, 2, 3 * 3600), 1800.0)
    tbot_calls = [c for c in calls if c[0] == "TBOT"]
    assert tbot_calls, "no TBOT reads recorded"
    for _, start, count in tbot_calls:
        assert start is not None and count is not None
        assert count[1] == 1 and start[1] == 1  # one lat row, row 1
        assert count[2] == NLON


def _assert_states_match(sa, sb, exact):
    """Exact when both trajectories ran the SAME executable; otherwise
    allow XLA fusion-reassociation noise between the stacked-body and
    series-body executables (the ingest payloads are bit-identical —
    asserted host-side above — but two different scan bodies may fuse
    elementwise chains differently, and a 1-ulp difference crossing a
    freeze/thaw threshold amplifies over 48 steps: observed 7e-14
    absolute on h2osoi_ice)."""
    mism = []
    for name, a in zip(sa._fields, sa):
        b = getattr(sb, name)
        a, b = np.asarray(a), np.asarray(b)
        if exact or a.dtype.kind != "f":
            if not np.array_equal(a, b):
                mism.append(name)
        elif not np.allclose(a, b, rtol=1e-9, atol=1e-12,
                             equal_nan=True):
            mism.append(name)
    assert not mism, f"state fields differ: {mism}"


@pytest.mark.slow
def test_model_series_ingest_from_files(forcing_dir):
    """Full-model equivalence: run_scan (stacked windows) vs
    run_scan_series (series layout) from the same month files —
    including a month-boundary crossing."""
    from elmkernels_tpu.driver.model import Model
    ncol = NCELL
    kw = dict(ncol=ncol, forcing_basename=forcing_dir)
    start = Date.from_ymd(1985, 7, 31, 18 * 3600)
    m_stack = Model(**kw)
    m_series = Model(**kw)
    d_stack = m_stack.run_scan(start, 24)
    d_series = m_series.run_scan_series(start, 24)
    _assert_states_match(m_stack.state, m_series.state, exact=False)
    np.testing.assert_allclose(np.asarray(d_stack.errsol_max),
                               np.asarray(d_series.errsol_max),
                               rtol=1e-9, atol=1e-15)


def test_run_windows_series_from_files(forcing_dir):
    """The production loop — run_windows(series=True) — end-to-end from
    month files, bit-identical to chunked run_scan_series (the same
    series executable; only the ingest pipeline differs)."""
    from elmkernels_tpu.driver.model import Model
    kw = dict(ncol=NCELL, forcing_basename=forcing_dir)
    start = Date.from_ymd(1985, 7, 10)
    m_a = Model(**kw)
    m_b = Model(**kw)
    m_a.run_scan_series(start, 4)
    start2 = start.copy()
    start2.increment_seconds(4 * 1800)
    m_a.run_scan_series(start2, 4)
    m_b.run_windows(start, 8, window=4, series=True)
    _assert_states_match(m_a.state, m_b.state, exact=True)


@pytest.mark.slow
def test_series_carries_aerosol_stream(forcing_dir, tmp_path):
    """The monthly aerosol deposition stream rides in the series payload
    (the r3 NotImplementedError is gone) — equivalent to the stacked
    path's host-interpolated rates, across a mid-month bracket flip."""
    from test_aerosol_data import _write_dep_file
    from elmkernels_tpu.driver.model import Model
    dep = tmp_path / "aerosoldep_monthly.nc"
    _write_dep_file(dep, ncell=NCELL)
    kw = dict(ncol=NCELL, forcing_basename=forcing_dir,
              aerosol_path=str(dep), lat_deg=85.0)
    start = Date.from_ymd(1985, 7, 14, 12 * 3600)  # mid-month bracket flip
    m_stack = Model(**kw)
    m_series = Model(**kw)
    m_stack.run_scan(start, 48)
    m_series.run_scan_series(start, 48)
    _assert_states_match(m_stack.state, m_series.state, exact=False)
    # the device-side monthly interpolation itself is bit-exact vs the
    # host _attach_aero path (same f64 multiply-add, same key order)
    import jax.numpy as jnp
    date = start.copy()
    ser, steps, (pu, ps), au = m_series._host_series(start, 3)
    assert au is not None and au.shape[1:] == (2, 11, NCELL)
    for k in range(3):
        host = m_stack._attach_aero(
            m_stack.forcing.window(date, m_stack.dtime), date).aero
        pair = au[int(ps[0][k])]
        dev = np.asarray(jnp.asarray(ps[1][k]) * jnp.asarray(pair[0])
                         + jnp.asarray(ps[2][k]) * jnp.asarray(pair[1]))
        np.testing.assert_array_equal(np.asarray(host), dev)
        date.increment_seconds(int(m_stack.dtime))
