"""Monthly satellite-phenology manager with a 3-month ring buffer.

Rebuild of the reference's ``PhenologyDataManager``
(``/root/reference/src/data/phenology_data.h:24-75``,
``phenology_data_impl.hh:8-130``): keeps MONTHLY_LAI/SAI/HEIGHT_TOP/
HEIGHT_BOT for the three bracketing months; on month rollover only the
newest month is read and the buffer rotates.
"""

from __future__ import annotations

import numpy as np

from elmkernels_tpu.data.netcdf_io import open_nc
from elmkernels_tpu.data.state import StepPhenology
from elmkernels_tpu.utils.dates import (Date, monthly_data_weights,
                                        triple_month_indices)

VARS = {"mlai": "MONTHLY_LAI", "msai": "MONTHLY_SAI",
        "mhtop": "MONTHLY_HEIGHT_TOP", "mhbot": "MONTHLY_HEIGHT_BOT"}


class PhenologyDataManager:
    """Reads per-PFT monthly phenology from a surfdata NetCDF, selecting
    each cell's vtype slice (reference filters by ``vtype``,
    ``phenology_data_impl.hh:60-100``)."""

    def __init__(self, path: str, ncol: int, vtype, col0: int = 0):
        self.path = path
        self.ncol = ncol
        self.col0 = col0
        self.vtype = np.asarray(vtype)
        self.buf = {k: np.zeros((3, ncol)) for k in VARS}
        self.months: list[int] = []  # month indices held in buf rows

    def _read_month(self, m: int) -> dict:
        """One month slice (m in 0..11) for each cell's PFT.

        File layout: var(time=12, pft, [lat, lon]) or (12, pft, gridcell).
        """
        f = open_nc(self.path)
        out = {}
        for k, vname in VARS.items():
            v = f.variables[vname]
            arr = np.asarray(v[m], np.float64)       # (pft, ...)
            arr = arr.reshape(arr.shape[0], -1)      # (pft, cells)
            cells = arr[:, self.col0:self.col0 + self.ncol]
            out[k] = cells[self.vtype, np.arange(self.ncol)]
        return out

    def update(self, date: Date) -> None:
        """Fill/rotate the ring buffer so it holds the three bracketing
        months of ``date`` (reference ``need_data`` semantics)."""
        m1, m2, m3 = triple_month_indices(date)
        want = [m1, m2, m3]
        if self.months == want:
            return
        if self.months and self.months[1:] == want[:2]:
            # rotate: drop oldest, read only the newest month
            for k in VARS:
                self.buf[k][0:2] = self.buf[k][1:3]
            new = self._read_month(m3)
            for k in VARS:
                self.buf[k][2] = new[k]
        else:
            for row, m in enumerate(want):
                data = self._read_month(m)
                for k in VARS:
                    self.buf[k][row] = data[k]
        self.months = want

    def window(self, date: Date) -> StepPhenology:
        self.update(date)
        wt1, wt2 = monthly_data_weights(date)
        return StepPhenology(
            wt1=wt1, wt2=wt2,
            mlai=self.buf["mlai"][0:2].copy(),
            msai=self.buf["msai"][0:2].copy(),
            mhtop=self.buf["mhtop"][0:2].copy(),
            mhbot=self.buf["mhbot"][0:2].copy())
