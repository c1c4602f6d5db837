"""NetCDFForcing month-file reader round-trip: write reference-layout
forcing files (basenameYYYY-MM.nc, DTIME in days, (DTIME,lat,lon) vars),
read windows back, verify bracketing samples/weights and the month-file
rollover + prefetch path (reference atm_data_impl.hh:248-319)."""

import numpy as np

from elmkernels_tpu.data import netcdf_io
from elmkernels_tpu.data.forcing import NetCDFForcing
from elmkernels_tpu.utils.dates import Date


def _write_month(path, year, month, ndays, nlat=2, nlon=2, bias=0.0,
                 humidity="QBOT", dim_order=("DTIME", "lat", "lon")):
    nt = ndays * 8  # 3-hourly
    dtime = np.arange(nt, dtype=np.float64) * (3.0 / 24.0)
    t = np.arange(nt, dtype=np.float64)[:, None, None]
    cell = np.arange(nlat * nlon, dtype=np.float64).reshape(1, nlat, nlon)
    dims = {"DTIME": None, "lat": nlat, "lon": nlon}
    mk = lambda base: base + bias + t * 0.01 + cell
    hum = (mk(0.001) * 1e-3 if humidity == "QBOT"
           else np.clip(mk(60.0), 0.0, 100.0))  # RH in percent
    fields = {
        "TBOT": mk(260.0), "PBOT": mk(90000.0), humidity: hum,
        "FLDS": mk(200.0), "FSDS": mk(100.0),
        "PRECTmms": mk(0.0) * 1e-6, "WIND": mk(3.0)}
    src = ("DTIME", "lat", "lon")
    perm = tuple(src.index(d) for d in dim_order)
    variables = {"DTIME": (("DTIME",), dtime)}
    for name, arr in fields.items():
        variables[name] = (dim_order, np.transpose(arr, perm))
    if dim_order[0] != "DTIME":
        # NetCDF classic: the record dim must lead; fix DTIME's length
        dims = {d: {"DTIME": nt, "lat": nlat,
                    "lon": nlon}[d] for d in dim_order}
    netcdf_io.write_nc(str(path), dims, variables)
    # return canonical (DTIME, lat, lon) views for assertions
    return {"DTIME": (("DTIME",), dtime),
            **{k: (src, v) for k, v in fields.items()}}


def test_window_bracketing_and_weights(tmp_path):
    base = str(tmp_path / "forc_")
    vs = _write_month(f"{base}1985-07.nc", 1985, 7, ndays=31)
    ncol = 4
    f = NetCDFForcing(base, ncol, lat_r=np.full(ncol, 1.2),
                      lon_r=np.full(ncol, 3.5))

    # step starting 03:00 on July 2, dt=1800 -> tmid = 1d + 3.25h
    date = Date.from_ymd(1985, 7, 2, 3 * 3600)
    w = f.window(date, 1800.0)
    tmid_h = 24.0 + 3.25
    idx = int(tmid_h // 3.0)
    frac = (tmid_h - idx * 3.0) / 3.0
    np.testing.assert_allclose(float(w.wt2), frac, rtol=1e-12)
    np.testing.assert_allclose(float(w.wt1), 1.0 - frac, rtol=1e-12)

    tbot_full = vs["TBOT"][1].reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(w.tbot),
                               tbot_full[idx:idx + 2], rtol=0)
    # flux data piecewise-constant at idx
    fsds_full = vs["FSDS"][1].reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(w.fsds), fsds_full[idx], rtol=0)


def test_rh_humidity_variant(tmp_path):
    """Files shipping RH instead of QBOT select the device-side
    RH->specific-humidity conversion (reference atm_data.h:95-186)."""
    base = str(tmp_path / "forc_")
    vs = _write_month(f"{base}1985-07.nc", 1985, 7, ndays=31,
                      humidity="RH")
    ncol = 4
    f = NetCDFForcing(base, ncol, lat_r=np.full(ncol, 1.2),
                      lon_r=np.full(ncol, 3.5))
    assert f.qbot_is_rh is True
    w = f.window(Date.from_ymd(1985, 7, 2, 3 * 3600), 1800.0)
    rh_full = vs["RH"][1].reshape(-1, 4)
    idx = int((24.0 + 3.25) // 3.0)
    np.testing.assert_allclose(np.asarray(w.qbot), rh_full[idx:idx + 2],
                               rtol=0)

    # the device conversion: q = RH/100 * qsat(T, P) via Lowe esat
    import jax.numpy as jnp
    from elmkernels_tpu.physics import atm_physics as ap
    t = jnp.asarray(w.tbot.mean(0))
    p = jnp.asarray(w.pbot.mean(0))
    q = ap.process_qbot(w.wt1, w.wt2, jnp.asarray(w.qbot[0]),
                        jnp.asarray(w.qbot[1]), t, p, is_rh=True)
    e = np.where(np.asarray(t) > 273.15,
                 np.asarray(ap.esatw(ap.tdc(t))),
                 np.asarray(ap.esati(ap.tdc(t))))
    qs = 0.622 * e / (np.asarray(p) - 0.378 * e)
    rh_interp = w.wt1 * w.qbot[0] + w.wt2 * w.qbot[1]
    np.testing.assert_allclose(np.asarray(q), rh_interp * qs / 100.0,
                               rtol=1e-12)


def test_dim_order_discovery(tmp_path):
    """(lat, DTIME, lon) files read identically to (DTIME, lat, lon)
    (reference atm_data_impl.hh:219-245)."""
    base = str(tmp_path / "forc_")
    vs = _write_month(f"{base}1985-07.nc", 1985, 7, ndays=31,
                      dim_order=("lat", "DTIME", "lon"))
    ncol = 4
    f = NetCDFForcing(base, ncol, lat_r=np.full(ncol, 1.2),
                      lon_r=np.full(ncol, 3.5))
    date = Date.from_ymd(1985, 7, 2, 3 * 3600)
    w = f.window(date, 1800.0)
    idx = int((24.0 + 3.25) // 3.0)
    tbot_full = vs["TBOT"][1].reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(w.tbot), tbot_full[idx:idx + 2],
                               rtol=0)


def test_out_of_bounds_raises(tmp_path):
    """A step past the last forcing interval with no next-month file is a
    hard error, not a stale-forcing reuse (atm_data_impl.hh:144-169)."""
    import pytest
    base = str(tmp_path / "forc_")
    _write_month(f"{base}1985-07.nc", 1985, 7, ndays=31)
    ncol = 4
    f = NetCDFForcing(base, ncol, lat_r=np.full(ncol, 1.2),
                      lon_r=np.full(ncol, 3.5))
    # last 3h interval of July ends at 31d; a step at 23:00 on July 31
    # has tmid in [30d+21h, 31d) -> beyond the last loaded sample pair
    with pytest.raises(ValueError, match="does not exist to bridge"):
        f.window(Date.from_ymd(1985, 7, 31, 23 * 3600), 1800.0)


def test_month_boundary_bridged_interpolation(tmp_path):
    """The last in-month interval interpolates against the next month's
    first sample (continuous global time, not a clipped stale window)."""
    base = str(tmp_path / "forc_")
    vs7 = _write_month(f"{base}1985-07.nc", 1985, 7, ndays=31)
    vs8 = _write_month(f"{base}1985-08.nc", 1985, 8, ndays=31, bias=5.0)
    ncol = 4
    f = NetCDFForcing(base, ncol, lat_r=np.full(ncol, 1.2),
                      lon_r=np.full(ncol, 3.5))
    w = f.window(Date.from_ymd(1985, 7, 31, 23 * 3600), 1800.0)
    t7 = vs7["TBOT"][1].reshape(-1, 4)
    t8 = vs8["TBOT"][1].reshape(-1, 4)
    np.testing.assert_allclose(np.asarray(w.tbot[0]), t7[-1], rtol=0)
    np.testing.assert_allclose(np.asarray(w.tbot[1]), t8[0], rtol=0)
    # tmid = 30d 23h15m; bracket start 30d 21h -> wt2 = 2.25/3
    np.testing.assert_allclose(float(w.wt2), 2.25 / 3.0, rtol=1e-12)


def test_month_rollover_uses_next_file(tmp_path):
    base = str(tmp_path / "forc_")
    _write_month(f"{base}1985-07.nc", 1985, 7, ndays=31)
    vs8 = _write_month(f"{base}1985-08.nc", 1985, 8, ndays=31, bias=5.0)
    ncol = 4
    f = NetCDFForcing(base, ncol, lat_r=np.full(ncol, 1.2),
                      lon_r=np.full(ncol, 3.5))
    # touch July (also prefetches August), then cross into August
    f.window(Date.from_ymd(1985, 7, 31, 22 * 3600), 1800.0)
    w = f.window(Date.from_ymd(1985, 8, 1, 6 * 3600), 1800.0)
    tbot8 = vs8["TBOT"][1].reshape(-1, 4)
    idx = int((6.25) // 3.0)
    np.testing.assert_allclose(np.asarray(w.tbot), tbot8[idx:idx + 2],
                               rtol=0)
