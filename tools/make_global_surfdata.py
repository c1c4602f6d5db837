#!/usr/bin/env python3
"""Generate a synthetic global surfdata NetCDF (VERDICT r3 item 5).

Produces a surfdata-style file with the variables
``Model.from_surfdata`` consumes (reference
``initialize_elm_kokkos.cc:267-340``, ``soil_data_impl.hh:139-241``):
LATIXY/LONGXY, SOIL_COLOR + mxsoil_color, PCT_SAND/PCT_CLAY/ORGANIC
[nlevsoi, cell], PCT_NAT_PFT [npft, cell] (dominant-PFT argmax), and
SLOPE/STD_ELEV — for ~N land cells with a land-area-weighted latitude
distribution (the real 0.5-degree ELM grid is ~260k land columns), all
20 soil-color classes, texture/organic gradients, and a
latitude-zoned C3/C4 PFT mix.  Deterministic in ncell, so the flagship
heterogeneous benchmark (``BENCH_HETERO=1 python bench.py``) can
regenerate the identical grid anywhere and drive the production
``from_surfdata`` init path with no hand-built parameter arrays.

  python tools/make_global_surfdata.py /tmp/surfdata_262144.nc 262144
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from elmkernels_tpu import constants as c      # noqa: E402
from elmkernels_tpu.data import netcdf_io      # noqa: E402

# approximate fraction of Earth's land area by latitude band
LAND_BANDS = ((-55.0, -30.0, 0.06), (-30.0, -10.0, 0.11),
              (-10.0, 10.0, 0.15), (10.0, 30.0, 0.21),
              (30.0, 50.0, 0.21), (50.0, 70.0, 0.21),
              (70.0, 84.0, 0.05))

# latitude-zoned dominant PFTs (two alternating per zone: keeps every
# batch mixed C3/C4 — the expensive photosynthesis pathway)
PFT_ZONES = ((-90.0, -30.0, (c.NBRDLF_EVR_TMP_TREE,
                             c.NC3_NONARCTIC_GRASS)),
             (-30.0, -10.0, (c.NC4_GRASS, c.NBRDLF_DCD_TRP_TREE)),
             (-10.0, 10.0, (c.NBRDLF_EVR_TRP_TREE, c.NC4_GRASS)),
             (10.0, 30.0, (c.NC4_GRASS, c.NBRDLF_EVR_SHRUB)),
             (30.0, 50.0, (c.NBRDLF_DCD_TMP_TREE, c.NSOYBEAN)),
             (50.0, 70.0, (c.NDLLF_EVR_BRL_TREE, c.NDLLF_DCD_BRL_TREE)),
             (70.0, 90.0, (c.NC3_ARCTIC_GRASS, c.NC3_ARCTIC_GRASS)))


def land_latitudes(ncell: int) -> np.ndarray:
    """Land-area-weighted cell latitudes, south to north."""
    counts = [int(round(w * ncell)) for _, _, w in LAND_BANDS]
    counts[-1] += ncell - sum(counts)
    lats = [np.linspace(lo, hi, n, endpoint=False)
            for (lo, hi, _), n in zip(LAND_BANDS, counts)]
    return np.concatenate(lats)


def grid_fields(ncell: int) -> dict:
    i = np.arange(ncell)
    lat = land_latitudes(ncell)
    lon = (i * 360.0 / 1024.0) % 360.0
    npft = c.MXPFT

    vtype = np.zeros(ncell, np.int64)
    for lo, hi, pfts in PFT_ZONES:
        zone = (lat >= lo) & (lat < hi)
        vtype[zone] = np.where((i[zone] % 2) == 0, pfts[0], pfts[1])
    pct_pft = np.zeros((npft, ncell), np.float32)
    pct_pft[vtype, i] = 80.0
    pct_pft[(vtype + 1) % npft, i] = 20.0  # subdominant (argmax-safe)

    lev = np.arange(c.NLEVSOI, dtype=np.float64)[:, None]
    sand = 20.0 + (i % 7) * 8.0 + 2.0 * lev
    clay = 10.0 + (i % 5) * 6.0 + 1.5 * lev
    organic = np.maximum(0.0, (2.0 + (i % 11) * 8.0) * (1.0 - 0.12 * lev))
    return {
        "LATIXY": lat, "LONGXY": lon,
        "SOIL_COLOR": ((i % 20) + 1).astype(np.int32),
        "PCT_NAT_PFT": pct_pft,
        "PCT_SAND": sand.astype(np.float32),
        "PCT_CLAY": clay.astype(np.float32),
        "ORGANIC": organic.astype(np.float32),
        "SLOPE": (0.01 + 0.3 * (i % 97) / 97.0).astype(np.float64),
        "STD_ELEV": (1.0 + 80.0 * (i % 89) / 89.0).astype(np.float64),
    }


def write_surfdata(path: str, ncell: int) -> str:
    f = grid_fields(ncell)
    dims = {"gridcell": ncell, "nlevsoi": c.NLEVSOI, "natpft": c.MXPFT,
            "scalar": 1}
    variables = {
        "LATIXY": (("gridcell",), f["LATIXY"]),
        "LONGXY": (("gridcell",), f["LONGXY"]),
        "SOIL_COLOR": (("gridcell",), f["SOIL_COLOR"]),
        "mxsoil_color": (("scalar",), np.array([20], np.int32)),
        "PCT_NAT_PFT": (("natpft", "gridcell"), f["PCT_NAT_PFT"]),
        "PCT_SAND": (("nlevsoi", "gridcell"), f["PCT_SAND"]),
        "PCT_CLAY": (("nlevsoi", "gridcell"), f["PCT_CLAY"]),
        "ORGANIC": (("nlevsoi", "gridcell"), f["ORGANIC"]),
        "SLOPE": (("gridcell",), f["SLOPE"]),
        "STD_ELEV": (("gridcell",), f["STD_ELEV"]),
    }
    netcdf_io.write_nc(path, dims, variables)
    return path


def ensure_surfdata(ncell: int, path: str | None = None) -> str:
    """Generate (once) and return the path of the ncell-cell surfdata."""
    import os
    if path is None:
        path = f"/tmp/elmtpu_surfdata_{ncell}.nc"
    if not os.path.exists(path):
        write_surfdata(path, ncell)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/surfdata.nc"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    print(write_surfdata(out, n))
