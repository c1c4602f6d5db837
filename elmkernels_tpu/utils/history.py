"""NetCDF history output: periodic time-series files of selected fields.

The reference ships the write primitives (``IO::init_writing``/``write``,
``read_netcdf.hh:173-255``; ``reshape_and_write_grid_cell``,
``read_input.hh:280-309``) but its drivers only ``std::cout`` prognostics
(``kokkos_driver.cc:59-81``).  ELM proper writes history files; this
module closes that gap: a :class:`HistoryWriter` buffers per-step values
of named diagnostics/state fields on the host and flushes one
NetCDF-classic file per window, with a no-leap time coordinate.

Device cost is one host pull per recorded field per step (fields are
[ncol] or [ncol, nlev]); for throughput runs record few fields or set a
large ``every``.
"""

from __future__ import annotations

import pathlib

import numpy as np

from elmkernels_tpu.data.netcdf_io import write_nc
from elmkernels_tpu.utils.dates import Date


class HistoryWriter:
    """Accumulate selected fields each step; write ``<stem>_NNNN.nc``
    every ``every`` steps (and on close).

    ``fields``: names resolved against the step diagnostics first, then
    the model state.  Scalars-per-column ([ncol]) get dims (time, col);
    layered fields ([ncol, nlev]) get (time, col, lev<nlev>).
    """

    def __init__(self, path: str, fields: tuple[str, ...] | list[str],
                 every: int = 48, ref_date: Date | None = None):
        p = pathlib.Path(path)
        self.stem = p.parent / p.name.replace(".nc", "")
        self.fields = tuple(fields)
        self.every = max(1, int(every))
        self.ref_date = ref_date
        self._buf: dict[str, list[np.ndarray]] = {f: [] for f in self.fields}
        self._times: list[float] = []
        self._seq = 0
        self.written: list[str] = []
        p.parent.mkdir(parents=True, exist_ok=True)

    def _decimal_days(self, date: Date) -> float:
        if self.ref_date is None:
            self.ref_date = date.copy()
        r = self.ref_date
        return ((date.year - r.year) * 365.0 + (date.doy - r.doy)
                + (date.sec - r.sec) / 86400.0)

    def record(self, date: Date, state, diags) -> None:
        self._times.append(self._decimal_days(date))
        for name in self.fields:
            src = diags if hasattr(diags, name) else state
            if not hasattr(src, name):
                raise KeyError(
                    f"history field {name!r} is neither a diagnostic "
                    f"({type(diags).__name__}) nor a state field")
            self._buf[name].append(np.asarray(getattr(src, name)))
        if len(self._times) >= self.every:
            self.flush()

    def flush(self) -> str | None:
        if not self._times:
            return None
        r = self.ref_date
        dims: dict = {"time": None}
        variables: dict = {
            "time": (("time",), np.asarray(self._times, dtype=np.float64))}
        attrs = {"time": {
            "units": (f"days since {r.year:04d} day {r.doy} "
                      f"sec {r.sec} (no-leap calendar)")}}
        for name, chunks in self._buf.items():
            arr = np.stack(chunks)          # [time, ncol, ...]
            dims.setdefault("col", arr.shape[1])
            vdims = ["time", "col"]
            for k, extent in enumerate(arr.shape[2:]):
                dn = f"lev{extent}"
                dims.setdefault(dn, extent)
                vdims.append(dn)
            variables[name] = (tuple(vdims), arr.astype(np.float64))
        path = f"{self.stem}_{self._seq:04d}.nc"
        write_nc(path, dims, variables, attrs)
        self.written.append(path)
        self._seq += 1
        self._buf = {f: [] for f in self.fields}
        self._times = []
        return path

    def close(self) -> None:
        self.flush()
