"""Surfdata-driven per-column grid initialization.

Reads one surfdata-style NetCDF into the per-column site arrays that
``data.params.default_params`` consumes: lat/lon, soil color, soil
texture profiles, and the dominant PFT per cell.  This is the rebuild of
the reference's heterogeneous grid init — the reference reads SOIL_COLOR
and PCT_SAND/PCT_CLAY/ORGANIC per cell and derives per-cell
hydraulic/thermal constants at init
(``/root/reference/driver/kokkos/initialize_elm_kokkos.cc:267-340``,
``src/data/soil_data_impl.hh:139-241``), and its domain decomposition
gives each cell its own lat/lon (``src/utils/utils.cc:46-69``).  The
reference hardwires vtype in the driver; real surfdata carries
PCT_NAT_PFT, from which the dominant PFT per cell is taken here.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from elmkernels_tpu.data.netcdf_io import open_nc
from elmkernels_tpu.data.soil_data import (read_soil_colors,
                                           read_soil_texture)


class SurfData(NamedTuple):
    """Per-column site arrays read from one surfdata NetCDF."""
    lat_deg: np.ndarray        # [ncol]
    lon_deg: np.ndarray        # [ncol]
    vtype: np.ndarray | None   # [ncol] i32 dominant PFT (None if absent)
    soil_color: np.ndarray     # [ncol] color class (1-based)
    mxsoil_color: int
    pct_sand: np.ndarray       # [ncol, nlevsoi]
    pct_clay: np.ndarray
    organic: np.ndarray
    topo_slope: np.ndarray | None  # [ncol] raw slope (None if absent)
    topo_std: np.ndarray | None    # [ncol] elevation std (None if absent)


def _grid_var(f, names, ncol, col0, path):
    """A per-cell variable by any of ``names``, flattened to [ncol]."""
    for name in names:
        if name in f.variables:
            arr = np.asarray(f.variables[name][:], np.float64).reshape(-1)
            if arr.size < col0 + ncol:
                raise ValueError(
                    f"{path}:{name}: {arr.size} cells < col0+ncol "
                    f"{col0 + ncol}")
            return arr[col0:col0 + ncol]
    raise KeyError(f"{path}: none of {names} present")


def read_surfdata(path: str, ncol: int, col0: int = 0) -> SurfData:
    """Read the per-column grid for this host's ``[col0, col0+ncol)``
    shard of the flattened (lat, lon) cell axis.

    Variables: LATIXY/LONGXY (cell coordinates), SOIL_COLOR +
    mxsoil_color, PCT_SAND/PCT_CLAY/ORGANIC [(nlevsoi), lat, lon], and
    optionally PCT_NAT_PFT [(natpft), lat, lon] (dominant = argmax) or a
    direct PFT index variable.
    """
    f = open_nc(path)
    lat = _grid_var(f, ["LATIXY", "LATITUDE", "lat"], ncol, col0, path)
    lon = _grid_var(f, ["LONGXY", "LONGITUDE", "lon"], ncol, col0, path)
    color, _albsat, _albdry = read_soil_colors(path, ncol, col0)
    mx = (int(np.asarray(f.variables["mxsoil_color"][:]).ravel()[0])
          if "mxsoil_color" in f.variables else 20)
    sand, clay, org = read_soil_texture(path, ncol, col0)

    vtype = None
    if "PCT_NAT_PFT" in f.variables:
        pct = np.asarray(f.variables["PCT_NAT_PFT"][:], np.float64)
        pct = pct.reshape(pct.shape[0], -1)  # (pft, cells)
        vtype = np.argmax(pct[:, col0:col0 + ncol],
                          axis=0).astype(np.int32)
    elif "PFT" in f.variables:
        vtype = np.asarray(
            f.variables["PFT"][:]).reshape(-1)[col0:col0 + ncol]
        vtype = vtype.astype(np.int32)

    def _opt(names):
        try:
            return _grid_var(f, names, ncol, col0, path)
        except KeyError:
            return None

    return SurfData(lat_deg=lat, lon_deg=lon, vtype=vtype,
                    soil_color=np.asarray(color), mxsoil_color=mx,
                    pct_sand=sand, pct_clay=clay, organic=org,
                    topo_slope=_opt(["SLOPE", "TOPO_SLOPE"]),
                    topo_std=_opt(["STD_ELEV", "TOPO_STD"]))
