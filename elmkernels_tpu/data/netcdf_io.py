"""Host-side NetCDF reading utilities.

Replaces the reference's serial/parallel NetCDF readers
(``/root/reference/src/utils/read_netcdf.hh``, ``read_pnetcdf.hh``): each
host reads its domain-decomposed hyperslab (scipy handles NetCDF classic;
the optional native reader in ``elmkernels_tpu.io`` accelerates bulk
forcing ingest), and sharded device arrays are assembled with
``jax.make_array_from_process_local_data`` in multi-host runs.
"""

from __future__ import annotations

import numpy as np


def open_nc(path: str):
    from scipy.io import netcdf_file
    return netcdf_file(str(path), mmap=False)


def prefetch(path: str) -> None:
    """Warm ``path`` on a background native thread while the device
    computes the current window (no-op without libelmio.so)."""
    from elmkernels_tpu.io import native
    native.prefetch(path)


def read_var(path_or_file, name: str, start=None, count=None) -> np.ndarray:
    """Read (a hyperslab of) a variable, applying scale/offset attributes
    (reference: ``read_netcdf.hh:43-130``).

    String paths go through the native C++ reader (hyperslab reads
    without materialising the full variable; picks up prefetched files);
    open scipy files and missing-lib fallback use scipy.
    """
    if isinstance(path_or_file, str):
        from elmkernels_tpu.io import native
        if native.available():
            with native.NativeNetCDF(path_or_file) as f:
                arr = f.read(name, start=start, count=count)
                scale = f.attr(name, "scale_factor")
                off = f.attr(name, "add_offset")
            if scale is not None and scale != 1.0:
                arr = arr * scale
            if off is not None and off != 0.0:
                arr = arr + off
            return arr
        f = open_nc(path_or_file)
    else:
        f = path_or_file
    v = f.variables[name]
    arr = np.asarray(v[:])
    if start is not None:
        sl = tuple(slice(s, s + n) for s, n in zip(start, count))
        arr = arr[sl]
    arr = arr.astype(np.float64, copy=False)
    scale = float(getattr(v, "scale_factor", 1.0))
    off = float(getattr(v, "add_offset", 0.0))
    if scale != 1.0 or off != 0.0:
        arr = arr * scale + off
    return arr


def var_packing(path: str, name: str) -> tuple[str, float, float]:
    """On-disk storage of a variable: (numpy dtype string, scale, off).

    Lets ingest ship data at *source precision*: a variable stored as
    NC_FLOAT with no scale/offset packing carries exactly 32 bits of
    information per value, so shipping it as f32 and promoting on
    device is bit-identical to the host's f64 read (f64->f32->f64 is a
    round-trip identity for values that originated as f32).  Returns
    dtype "other" for non-float storage (packed shorts etc.)."""
    _NC_DTYPE = {5: "f4", 6: "f8"}
    if isinstance(path, str):
        from elmkernels_tpu.io import native
        if native.available():
            with native.NativeNetCDF(path) as f:
                dt = _NC_DTYPE.get(f.var_type(name), "other")
                scale = f.attr(name, "scale_factor")
                off = f.attr(name, "add_offset")
            return (dt, 1.0 if scale is None else float(scale),
                    0.0 if off is None else float(off))
    f = open_nc(path)
    v = f.variables[name]
    tc = {"f": "f4", "d": "f8"}.get(v.typecode(), "other")
    return (tc, float(getattr(v, "scale_factor", 1.0)),
            float(getattr(v, "add_offset", 0.0)))


def get_dimensions(path: str, name: str) -> tuple[int, ...]:
    f = open_nc(path)
    return tuple(int(d) for d in f.variables[name].shape)


def get_var_dimnames(path: str, name: str) -> tuple[str, ...]:
    """Dimension names of a variable (reference ``get_var_dimids``,
    ``read_netcdf.hh:132-150``, used for forcing dim-order discovery)."""
    f = open_nc(path)
    return tuple(f.variables[name].dimensions)


def has_variable(path: str, name: str) -> bool:
    f = open_nc(path)
    return name in f.variables


def reshape_grid_to_cells(arr: np.ndarray) -> np.ndarray:
    """(t, lat, lon) -> (t, cell), matching the reference's
    ``read_and_reshape_forcing`` (``read_input.hh:150-309``)."""
    if arr.ndim >= 3:
        return arr.reshape(arr.shape[0], -1)
    return arr


def write_nc(path: str, dims: dict, variables: dict,
             attrs: dict | None = None) -> None:
    """Create a NetCDF-classic file (reference ``IO::init_writing`` +
    ``IO::write``, ``read_netcdf.hh:173-255``): define dims, then write
    each variable.

    ``dims``: name -> length (None for the record dim).
    ``variables``: name -> (dim_names tuple, ndarray).
    """
    from scipy.io import netcdf_file
    with netcdf_file(str(path), "w") as f:
        for dname, dlen in dims.items():
            f.createDimension(dname, dlen)
        for vname, (vdims, arr) in variables.items():
            arr = np.asarray(arr)
            v = f.createVariable(vname, arr.dtype.char, tuple(vdims))
            v[:] = arr
            for aname, aval in (attrs or {}).get(vname, {}).items():
                setattr(v, aname, aval)


def reshape_and_write_grid_cell(path: str, cell_vars: dict,
                                nlat: int, nlon: int) -> None:
    """(t, cell) arrays back to (t, lat, lon) files — the reference's
    test-input writer (``read_input.hh:280-309``) used to cut per-cell
    golden inputs from gridded data."""
    dims = {"time": None, "lat": nlat, "lon": nlon}
    variables = {}
    for name, arr in cell_vars.items():
        arr = np.asarray(arr)
        if arr.ndim == 2:  # (t, cell)
            variables[name] = (("time", "lat", "lon"),
                               arr.reshape(arr.shape[0], nlat, nlon))
        else:  # (cell,)
            variables[name] = (("lat", "lon"), arr.reshape(nlat, nlon))
    write_nc(path, dims, variables)
