"""Native NetCDF-3 reader (native/elmio.cc) vs scipy round-trip.

Covers: classic-format header parse, fixed + record variables, all common
dtypes, hyperslab reads, numeric attributes, and the background prefetch
path (reference IO layer: /root/reference/src/utils/read_netcdf.hh).
"""

import numpy as np
import pytest
from scipy.io import netcdf_file

from elmkernels_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="libelmio.so not built (make -C native)")


@pytest.fixture(scope="module")
def ncfile(tmp_path_factory):
    path = tmp_path_factory.mktemp("nc") / "forcing.nc"
    rng = np.random.default_rng(7)
    nt, ny, nx = 9, 4, 6
    temp = rng.uniform(240.0, 310.0, (nt, ny, nx)).astype(np.float64)
    rain = rng.uniform(0.0, 1e-3, (nt, ny, nx)).astype(np.float32)
    elev = rng.uniform(0.0, 3000.0, (ny, nx)).astype(np.float32)
    mask = rng.integers(0, 2, (ny, nx)).astype(np.int32)
    scount = rng.integers(-5, 300, (ny, nx)).astype(np.int16)
    with netcdf_file(path, "w") as f:
        f.createDimension("time", None)
        f.createDimension("y", ny)
        f.createDimension("x", nx)
        v = f.createVariable("TBOT", "d", ("time", "y", "x"))
        v[:] = temp
        v.scale_factor = 1.0
        v.add_offset = 0.0
        v = f.createVariable("PRECIP", "f", ("time", "y", "x"))
        v[:] = rain
        v = f.createVariable("elev", "f", ("y", "x"))
        v[:] = elev
        v = f.createVariable("mask", "i", ("y", "x"))
        v[:] = mask
        v = f.createVariable("scount", "h", ("y", "x"))
        v[:] = scount
    return path, temp, rain, elev, mask, scount


def test_shapes_and_full_reads(ncfile):
    path, temp, rain, elev, mask, scount = ncfile
    with native.NativeNetCDF(path) as f:
        assert f.shape("TBOT") == temp.shape
        assert f.shape("elev") == elev.shape
        np.testing.assert_array_equal(f.read("TBOT"), temp)
        np.testing.assert_allclose(f.read("PRECIP"), rain.astype(np.float64),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(f.read("elev"), elev.astype(np.float64))
        np.testing.assert_array_equal(f.read("mask"), mask)
        np.testing.assert_array_equal(f.read("scount"), scount)


def test_hyperslab_record_var(ncfile):
    path, temp, *_ = ncfile
    with native.NativeNetCDF(path) as f:
        # middle records, interior window — exercises record stride math
        got = f.read("TBOT", start=(3, 1, 2), count=(4, 2, 3))
        np.testing.assert_array_equal(got, temp[3:7, 1:3, 2:5])
        # single record
        got = f.read("TBOT", start=(8, 0, 0), count=(1, 4, 6))
        np.testing.assert_array_equal(got, temp[8:9])


def test_hyperslab_fixed_var(ncfile):
    path, _, _, elev, *_ = ncfile
    with native.NativeNetCDF(path) as f:
        got = f.read("elev", start=(1, 2), count=(2, 3))
        np.testing.assert_allclose(got, elev[1:3, 2:5].astype(np.float64))


def test_attributes(ncfile):
    path, *_ = ncfile
    with native.NativeNetCDF(path) as f:
        assert f.attr("TBOT", "scale_factor") == 1.0
        assert f.attr("TBOT", "add_offset") == 0.0
        assert f.attr("TBOT", "nope") is None


def test_prefetch_roundtrip(ncfile):
    path, temp, *_ = ncfile
    native.prefetch(path)
    with native.NativeNetCDF(path) as f:  # takes the prefetched handle
        np.testing.assert_array_equal(f.read("TBOT"), temp)


def test_missing_var_and_file(ncfile, tmp_path):
    path, *_ = ncfile
    with native.NativeNetCDF(path) as f:
        with pytest.raises(KeyError):
            f.shape("missing")
    with pytest.raises(OSError):
        native.NativeNetCDF(tmp_path / "nope.nc")
