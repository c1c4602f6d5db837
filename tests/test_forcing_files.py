"""NetCDFForcing month-file reader round-trip: write reference-layout
forcing files (basenameYYYY-MM.nc, DTIME in days, (DTIME,lat,lon) vars),
read windows back, verify bracketing samples/weights and the month-file
rollover + prefetch path (reference atm_data_impl.hh:248-319)."""

import numpy as np

from elmkernels_tpu.data import netcdf_io
from elmkernels_tpu.data.forcing import NetCDFForcing
from elmkernels_tpu.utils.dates import Date


def _write_month(path, year, month, ndays, nlat=2, nlon=2, bias=0.0):
    nt = ndays * 8  # 3-hourly
    dtime = np.arange(nt, dtype=np.float64) * (3.0 / 24.0)
    t = np.arange(nt, dtype=np.float64)[:, None, None]
    cell = np.arange(nlat * nlon, dtype=np.float64).reshape(1, nlat, nlon)
    dims = {"DTIME": None, "lat": nlat, "lon": nlon}
    mk = lambda base: base + bias + t * 0.01 + cell
    variables = {
        "DTIME": (("DTIME",), dtime),
        "TBOT": (("DTIME", "lat", "lon"), mk(260.0)),
        "PBOT": (("DTIME", "lat", "lon"), mk(90000.0)),
        "QBOT": (("DTIME", "lat", "lon"), mk(0.001) * 1e-3),
        "FLDS": (("DTIME", "lat", "lon"), mk(200.0)),
        "FSDS": (("DTIME", "lat", "lon"), mk(100.0)),
        "PRECTmms": (("DTIME", "lat", "lon"), mk(0.0) * 1e-6),
        "WIND": (("DTIME", "lat", "lon"), mk(3.0)),
    }
    netcdf_io.write_nc(str(path), dims, variables)
    return variables


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
