"""ctypes bindings for the native NetCDF-3 reader (``native/elmio.cc``).

TPU-native replacement for the reference's synchronous (P)NetCDF forcing
reads (``/root/reference/src/utils/read_netcdf.hh``,
``atm_data_impl.hh:248-319``): hyperslab reads come from a resident C++
parse, and :func:`prefetch` warms the *next* forcing window on a
background thread while the device computes.

Falls back to :mod:`scipy.io.netcdf_file` when the shared library has not
been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import threading
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libelmio.so"
_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.elmio_open.argtypes = [ctypes.c_char_p]
        lib.elmio_open.restype = ctypes.c_int
        lib.elmio_close.argtypes = [ctypes.c_int]
        lib.elmio_last_error.restype = ctypes.c_char_p
        lib.elmio_var_ndims.argtypes = [
            ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64)]
        lib.elmio_var_ndims.restype = ctypes.c_int
        lib.elmio_get_att.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double)]
        lib.elmio_get_att.restype = ctypes.c_int
        lib.elmio_var_type.argtypes = [ctypes.c_int, ctypes.c_char_p]
        lib.elmio_var_type.restype = ctypes.c_int
        lib.elmio_read_f64.argtypes = [
            ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double)]
        lib.elmio_read_f64.restype = ctypes.c_int
        lib.elmio_prefetch.argtypes = [ctypes.c_char_p]
        lib.elmio_take_prefetched.argtypes = [ctypes.c_char_p]
        lib.elmio_take_prefetched.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def prefetch(path: str | os.PathLike) -> None:
    """Warm ``path`` on a background C++ thread (no-op without the lib)."""
    lib = _load()
    if lib is not None:
        lib.elmio_prefetch(str(path).encode())


class NativeNetCDF:
    """Read-only NetCDF-3 (classic / 64-bit offset) file.

    ``read(name, start, count)`` returns a float64 array of shape
    ``count``; ``shape(name)`` resolves the record dimension.
    """

    def __init__(self, path: str | os.PathLike):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libelmio.so not built — run `make -C native` "
                "(or use the scipy fallback in netcdf_io.py)")
        self._lib = lib
        p = str(path).encode()
        h = lib.elmio_take_prefetched(p)
        if h < 0:
            h = lib.elmio_open(p)
        if h < 0:
            raise OSError(lib.elmio_last_error().decode())
        self._h = h

    def close(self):
        if self._h >= 0:
            self._lib.elmio_close(self._h)
            self._h = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def shape(self, name: str) -> tuple[int, ...]:
        dims = (ctypes.c_int64 * 32)()
        nd = self._lib.elmio_var_ndims(self._h, name.encode(), dims)
        if nd < 0:
            raise KeyError(name)
        return tuple(dims[i] for i in range(nd))

    def var_type(self, name: str) -> int:
        """On-disk NetCDF type id (NC_FLOAT=5, NC_DOUBLE=6, ...);
        negative if unknown."""
        return self._lib.elmio_var_type(self._h, name.encode())

    def attr(self, var: str, att: str) -> float | None:
        out = ctypes.c_double()
        rc = self._lib.elmio_get_att(self._h, var.encode(), att.encode(),
                                     ctypes.byref(out))
        return out.value if rc == 0 else None

    def read(self, name: str, start=None, count=None) -> np.ndarray:
        shp = self.shape(name)
        nd = len(shp)
        if start is None:
            start = (0,) * nd
        if count is None:
            count = tuple(s - st for s, st in zip(shp, start))
        assert len(start) == nd and len(count) == nd, (name, start, count)
        out = np.empty(count, dtype=np.float64)
        c_start = (ctypes.c_int64 * nd)(*start)
        c_count = (ctypes.c_int64 * nd)(*count)
        rc = self._lib.elmio_read_f64(
            self._h, name.encode(), c_start, c_count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc != 0:
            raise OSError(f"elmio_read_f64({name}) failed: rc={rc}")
        return out
