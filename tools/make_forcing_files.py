#!/usr/bin/env python3
"""Generate reference-layout month-per-file NetCDF forcing.

Writes ``<basename>YYYY-MM.nc`` files with the reference's atmospheric
forcing layout (``/root/reference/src/utils/read_input.hh:150-309``,
``atm_data_impl.hh:248-319``): a DTIME record axis in days since the
month start, plus TBOT/PBOT/QBOT/FLDS/FSDS/PRECTmms/WIND on
(DTIME, lat, lon).  The fields are a deterministic analytic weather
(seasonal + diurnal cycles with per-cell phase offsets) so tests and the
ingest benchmark can regenerate identical files anywhere.

Used by ``tools/ingest_bench.py --files`` (VERDICT r3 item 1) and the
forcing-series file tests.

CLI:
  python tools/make_forcing_files.py OUTDIR/basename_ 1985 7 --months 2 \
      --nlat 256 --nlon 256 --dt-hours 3
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from elmkernels_tpu.data import netcdf_io           # noqa: E402
from elmkernels_tpu.utils.dates import Date, DAYS_PER_MONTH  # noqa: E402


def month_fields(year: int, month: int, nlat: int, nlon: int,
                 dt_hours: float = 3.0) -> dict:
    """Analytic forcing fields for one month, (nt, nlat, nlon) each.

    Deterministic in (year, month, grid): global time enters through the
    month's start day-of-year, so consecutive months are continuous."""
    ndays = DAYS_PER_MONTH[month - 1]
    nt = int(round(ndays * 24.0 / dt_hours))
    dtime = np.arange(nt, dtype=np.float64) * (dt_hours / 24.0)
    start_doy = Date.from_ymd(year, month, 1).doy
    doy = start_doy + dtime[:, None, None]           # absolute day-of-year
    hour = (doy * 24.0) % 24.0
    cell = np.arange(nlat * nlon, dtype=np.float64).reshape(1, nlat, nlon)
    phase = 2.0 * np.pi * cell / max(1.0, nlat * nlon)

    seasonal = -12.0 * np.cos(2.0 * np.pi * doy / 365.0 + 0.3 * phase)
    diurnal = 6.0 * np.sin(2.0 * np.pi * (hour - 9.0) / 24.0)
    tbot = 278.0 + seasonal + diurnal
    pbot = 98000.0 + 500.0 * np.sin(2.0 * np.pi * doy / 29.0 + phase)
    qbot = np.maximum(1.0e-4,
                      0.004 + 0.003 * np.sin(2.0 * np.pi * doy / 365.0
                                             + 0.1 * phase))
    flds = 220.0 + 60.0 * np.cos(2.0 * np.pi * (doy - 200.0) / 365.0
                                 + 0.2 * phase)
    wind = 3.0 + 2.0 * np.sin(2.0 * np.pi * doy / 13.0 + phase)
    sun = np.maximum(0.0, np.sin(np.pi * (hour - 6.0) / 12.0))
    fsds = 600.0 * sun * (0.6 + 0.4 * np.sin(2.0 * np.pi * doy / 365.0))
    wet = (np.floor(doy * 3.0 + cell) % 7.0) < 2.0
    prec = np.where(wet, 2.5e-5, 0.0)
    return {"DTIME": dtime, "TBOT": tbot, "PBOT": pbot, "QBOT": qbot,
            "FLDS": flds, "FSDS": fsds, "PRECTmms": prec, "WIND": wind}


def write_month(basename: str, year: int, month: int, nlat: int,
                nlon: int, dt_hours: float = 3.0,
                dtype=np.float32) -> str:
    """Write one ``<basename>YYYY-MM.nc`` (skips nothing; overwrites)."""
    f = month_fields(year, month, nlat, nlon, dt_hours)
    path = f"{basename}{year:04d}-{month:02d}.nc"
    dims = {"DTIME": None, "lat": nlat, "lon": nlon}
    variables = {"DTIME": (("DTIME",), f["DTIME"])}
    for k in ("TBOT", "PBOT", "QBOT", "FLDS", "FSDS", "PRECTmms", "WIND"):
        variables[k] = (("DTIME", "lat", "lon"), f[k].astype(dtype))
    netcdf_io.write_nc(path, dims, variables)
    return path


def write_months(basename: str, year: int, month: int, nmonths: int,
                 nlat: int, nlon: int, dt_hours: float = 3.0,
                 dtype=np.float32) -> list[str]:
    paths = []
    y, m = year, month
    for _ in range(nmonths):
        paths.append(write_month(basename, y, m, nlat, nlon, dt_hours,
                                 dtype))
        y, m = (y, m + 1) if m < 12 else (y + 1, 1)
    return paths


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("basename")
    ap.add_argument("year", type=int)
    ap.add_argument("month", type=int)
    ap.add_argument("--months", type=int, default=1)
    ap.add_argument("--nlat", type=int, default=64)
    ap.add_argument("--nlon", type=int, default=64)
    ap.add_argument("--dt-hours", type=float, default=3.0)
    ap.add_argument("--f64", action="store_true",
                    help="write f64 fields (default f32, the usual "
                         "forcing-file precision)")
    a = ap.parse_args()
    Path(a.basename).parent.mkdir(parents=True, exist_ok=True)
    for p in write_months(a.basename, a.year, a.month, a.months, a.nlat,
                          a.nlon, a.dt_hours,
                          np.float64 if a.f64 else np.float32):
        print(p)


if __name__ == "__main__":
    main()
