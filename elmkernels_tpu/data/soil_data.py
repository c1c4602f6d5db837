"""Soil surface data: color-class albedo tables and texture readers.

Rebuild of ``/root/reference/src/data/soil_data.h`` /
``soil_data_impl.hh``: hard-coded saturated/dry albedo tables (8- and
20-color) plus surfdata NetCDF readers for SOIL_COLOR and
PCT_SAND/PCT_CLAY/ORGANIC.
"""

from __future__ import annotations

import numpy as np

from elmkernels_tpu.data.netcdf_io import open_nc
from elmkernels_tpu.data.params import ALBDRY_20, ALBSAT_20

ALBSAT_8 = np.array([
    [0.12, 0.24], [0.11, 0.22], [0.10, 0.20], [0.09, 0.18], [0.08, 0.16],
    [0.07, 0.14], [0.06, 0.12], [0.05, 0.10]])
ALBDRY_8 = np.array([
    [0.24, 0.48], [0.22, 0.44], [0.20, 0.40], [0.18, 0.36], [0.16, 0.32],
    [0.14, 0.28], [0.12, 0.24], [0.10, 0.20]])


def get_albsat(mxsoil_color: int) -> np.ndarray:
    """Reference: ``soil_data_impl.hh`` ``get_albsat`` (note the 8-class
    table's first vis entry reads 12.0 in the reference — a literal typo
    for 0.12, corrected here)."""
    if mxsoil_color == 8:
        return ALBSAT_8
    if mxsoil_color == 20:
        return ALBSAT_20
    raise ValueError("mxsoil_color must be 8 or 20")


def get_albdry(mxsoil_color: int) -> np.ndarray:
    if mxsoil_color == 8:
        return ALBDRY_8
    if mxsoil_color == 20:
        return ALBDRY_20
    raise ValueError("mxsoil_color must be 8 or 20")


def read_soil_colors(path: str, ncol: int, col0: int = 0):
    """SOIL_COLOR classes + per-cell albsat/albdry rows.

    Reference: ``soil_data_impl.hh`` ``read_soil_colors``.
    """
    f = open_nc(path)
    mx = int(np.asarray(f.variables["mxsoil_color"][:]).ravel()[0]) \
        if "mxsoil_color" in f.variables else 20
    color = np.asarray(f.variables["SOIL_COLOR"][:]).reshape(-1)
    color = color[col0:col0 + ncol].astype(int)
    albsat = get_albsat(mx)[np.clip(color - 1, 0, mx - 1)]
    albdry = get_albdry(mx)[np.clip(color - 1, 0, mx - 1)]
    return color, albsat, albdry


def read_soil_texture(path: str, ncol: int, col0: int = 0):
    """PCT_SAND/PCT_CLAY/ORGANIC profiles [ncol, nlevsoi].

    Reference: ``soil_data_impl.hh`` ``read_soil_texture``.
    """
    f = open_nc(path)
    def grab(name):
        arr = np.asarray(f.variables[name][:], np.float64)
        arr = arr.reshape(arr.shape[0], -1)  # (lev, cells)
        return arr[:, col0:col0 + ncol].T   # (ncol, lev)
    return grab("PCT_SAND"), grab("PCT_CLAY"), grab("ORGANIC")


def read_organic_max(param_path: str) -> float:
    f = open_nc(param_path)
    return float(np.asarray(f.variables["organic_max"][:]).ravel()[0])
