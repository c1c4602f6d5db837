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


def test_history_writer(tmp_path):
    """HistoryWriter: per-window files, no-leap time coordinate, field
    resolution against diags-then-state, layered-field dims."""
    from collections import namedtuple

    from elmkernels_tpu.utils.dates import Date
    from elmkernels_tpu.utils.history import HistoryWriter

    State = namedtuple("State", ["t_grnd", "h2osoi_liq"])
    Diags = namedtuple("Diags", ["eflx_sh_tot"])
    ncol, nlev = 3, 5
    date = Date.from_ymd(1985, 1, 1)
    hw = HistoryWriter(str(tmp_path / "hist.nc"),
                       ["t_grnd", "eflx_sh_tot", "h2osoi_liq"],
                       every=4, ref_date=date.copy())
    nsteps = 10
    for i in range(nsteps):
        st = State(np.full(ncol, 270.0 + i),
                   np.full((ncol, nlev), float(i)))
        dg = Diags(np.full(ncol, -5.0 * i))
        hw.record(date, st, dg)
        date.increment_seconds(1800)
    hw.close()

    assert len(hw.written) == 3  # 4 + 4 + 2 steps
    t_all, sh_all, liq_all = [], [], []
    for p in hw.written:
        tm = netcdf_io.read_var(p, "time")
        t_all.extend(tm.tolist())
        sh = netcdf_io.read_var(p, "eflx_sh_tot")
        assert sh.shape[1] == ncol
        sh_all.extend(sh[:, 0].tolist())
        liq = netcdf_io.read_var(p, "h2osoi_liq")
        assert liq.shape[1:] == (ncol, nlev)
        liq_all.extend(liq[:, 0, 0].tolist())
    np.testing.assert_allclose(
        t_all, np.arange(nsteps) * 1800.0 / 86400.0)
    np.testing.assert_allclose(sh_all, -5.0 * np.arange(nsteps))
    np.testing.assert_allclose(liq_all, np.arange(nsteps, dtype=float))


def test_history_writer_unknown_field(tmp_path):
    from collections import namedtuple

    import pytest

    from elmkernels_tpu.utils.dates import Date
    from elmkernels_tpu.utils.history import HistoryWriter

    State = namedtuple("State", ["t_grnd"])
    Diags = namedtuple("Diags", ["fsa"])
    hw = HistoryWriter(str(tmp_path / "h.nc"), ["nope"], every=2)
    with pytest.raises(KeyError):
        hw.record(Date.from_ymd(1985, 1, 1),
                  State(np.zeros(2)), Diags(np.zeros(2)))
