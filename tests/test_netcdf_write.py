"""NetCDF write utilities (reference IO::init_writing/write,
read_netcdf.hh:173-255, and reshape_and_write_grid_cell,
read_input.hh:280-309) — write with scipy, read back with the native
reader when available."""

import numpy as np

from elmkernels_tpu.data import netcdf_io


def test_write_and_readback(tmp_path):
    path = str(tmp_path / "out.nc")
    t = np.arange(12, dtype=np.float64).reshape(3, 4)
    z = np.linspace(0.0, 1.0, 4)
    netcdf_io.write_nc(
        path,
        dims={"time": None, "x": 4},
        variables={"T": (("time", "x"), t), "z": (("x",), z)},
        attrs={"T": {"scale_factor": 2.0}})
    got = netcdf_io.read_var(path, "T")
    np.testing.assert_allclose(got, t * 2.0)  # scale applied on read
    np.testing.assert_allclose(netcdf_io.read_var(path, "z"), z)


def test_reshape_and_write_grid_cell(tmp_path):
    path = str(tmp_path / "grid.nc")
    nt, nlat, nlon = 2, 3, 4
    rng = np.random.default_rng(0)
    forc = rng.normal(size=(nt, nlat * nlon))
    elev = rng.normal(size=(nlat * nlon,))
    netcdf_io.reshape_and_write_grid_cell(
        path, {"FSDS": forc, "elev": elev}, nlat, nlon)
    back = netcdf_io.read_var(path, "FSDS")
    assert back.shape == (nt, nlat, nlon)
    np.testing.assert_allclose(
        netcdf_io.reshape_grid_to_cells(back), forc)
    np.testing.assert_allclose(
        netcdf_io.read_var(path, "elev").ravel(), elev)
