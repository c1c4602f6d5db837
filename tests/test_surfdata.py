"""Surfdata-driven heterogeneous grid initialization, end to end.

A synthetic surfdata NetCDF where columns differ in latitude, soil
color, soil texture AND PFT must initialize through
``Model.from_surfdata`` and evolve each column exactly like a
homogeneous single-column run of that column's site values (pattern of
``test_heterogeneous_pft.test_mixed_batch_matches_homogeneous_runs``).

Also covers the NetCDF wiring of the driver's remaining parameter
files: SNICAR optics dispatched by ``.nc`` extension, snow-aging tables
via ``snow_aging_path`` (required for ``elm_correct_snow_aging``), and
``organic_max`` read from the parameter file.

Reference: ``initialize_elm_kokkos.cc:23-60`` (optics + aging files),
``:267-340`` (soil color/texture init), ``soil_data_impl.hh:139-241``,
``utils.cc:46-69`` (per-cell lat/lon).
"""

import numpy as np
import pytest

from elmkernels_tpu.data import netcdf_io, params as params_mod
from elmkernels_tpu.data.surfdata import read_surfdata
from elmkernels_tpu.driver.model import DEFAULT_PFT_PATH, Model
from elmkernels_tpu.utils.dates import Date

NLAT, NLON = 2, 2
NCOL = NLAT * NLON
NLEVSOI = 10

LATS = [71.323, 40.0, 55.5, 30.0]
LONS = [203.3886, 255.0, 10.0, 80.0]
COLORS = [15, 3, 8, 20]
PFTS = [1, 12, 14, 23]  # C3 tree, arctic C3 grass, C4 grass, soybean
SAND0 = [40.0, 70.0, 20.0, 55.0]   # surface values; profiles vary by depth
CLAY0 = [20.0, 10.0, 45.0, 25.0]
ORG0 = [10.0, 1.0, 80.0, 30.0]
SLOPES = [0.21, 0.30, 0.25, 0.45]  # raw slope per cell (above the
#                                    reference's 0.2 floor so the derived
#                                    micro_sigma actually differs)
STDEVS = [12.0, 120.0, 25.0, 40.0]  # elevation std per cell (above the
#                                     reference's 10 m floor in n_melt)
NSTEP = 8


def _profiles():
    lev = np.arange(NLEVSOI, dtype=np.float64)[:, None]
    sand = np.asarray(SAND0)[None, :] - 0.5 * lev
    clay = np.asarray(CLAY0)[None, :] + 0.25 * lev
    org = np.asarray(ORG0)[None, :] * np.exp(-0.3 * lev)
    return sand, clay, org  # (nlevsoi, ncol) each


def _write_surfdata(path, npft=25):
    sand, clay, org = _profiles()
    grid2 = ("lsmlat", "lsmlon")
    grid3 = ("nlevsoi",) + grid2
    pct_pft = np.zeros((npft, NCOL))
    pct_pft[PFTS, np.arange(NCOL)] = 100.0
    dims = {"lsmlat": NLAT, "lsmlon": NLON, "nlevsoi": NLEVSOI,
            "natpft": npft, "one": 1}
    variables = {
        "LATIXY": (grid2, np.asarray(LATS).reshape(NLAT, NLON)),
        "LONGXY": (grid2, np.asarray(LONS).reshape(NLAT, NLON)),
        "SOIL_COLOR": (grid2,
                       np.asarray(COLORS, np.int32).reshape(NLAT, NLON)),
        "mxsoil_color": (("one",), np.asarray([20], np.int32)),
        "PCT_SAND": (grid3, sand.reshape(NLEVSOI, NLAT, NLON)),
        "PCT_CLAY": (grid3, clay.reshape(NLEVSOI, NLAT, NLON)),
        "ORGANIC": (grid3, org.reshape(NLEVSOI, NLAT, NLON)),
        "PCT_NAT_PFT": (("natpft",) + grid2,
                        pct_pft.reshape(npft, NLAT, NLON)),
        "SLOPE": (grid2, np.asarray(SLOPES).reshape(NLAT, NLON)),
        "STD_ELEV": (grid2, np.asarray(STDEVS).reshape(NLAT, NLON)),
    }
    netcdf_io.write_nc(str(path), dims, variables)


@pytest.fixture(scope="module")
def surfdata_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("surf") / "surfdata_synth.nc"
    _write_surfdata(path)
    return str(path)


def test_read_surfdata_roundtrip(surfdata_path):
    sd = read_surfdata(surfdata_path, NCOL)
    np.testing.assert_allclose(sd.lat_deg, LATS)
    np.testing.assert_allclose(sd.lon_deg, LONS)
    np.testing.assert_array_equal(sd.soil_color, COLORS)
    assert sd.mxsoil_color == 20
    np.testing.assert_array_equal(sd.vtype, PFTS)
    sand, clay, org = _profiles()
    np.testing.assert_allclose(sd.pct_sand, sand.T)
    np.testing.assert_allclose(sd.pct_clay, clay.T)
    np.testing.assert_allclose(sd.organic, org.T)
    np.testing.assert_allclose(sd.topo_slope, SLOPES)
    np.testing.assert_allclose(sd.topo_std, STDEVS)


def test_read_surfdata_shard_offset(surfdata_path):
    """col0/ncol select a hyperslab of the flattened cell axis (the
    per-host shard contract, reference ``read_input.cc:52-87``)."""
    sd = read_surfdata(surfdata_path, 2, col0=1)
    np.testing.assert_allclose(sd.lat_deg, LATS[1:3])
    np.testing.assert_array_equal(sd.vtype, PFTS[1:3])
    np.testing.assert_allclose(sd.pct_sand, _profiles()[0].T[1:3])


@pytest.mark.slow
def test_from_surfdata_matches_homogeneous_runs(surfdata_path):
    """Each column of the surfdata-initialized batch (heterogeneous in
    lat, lon, soil color, texture AND PFT) tracks a homogeneous
    single-column run of the same site."""
    het = Model.from_surfdata(surfdata_path, NCOL)
    het.run(Date(1985, 1, 1), NSTEP)
    het_state = {k: np.asarray(v) for k, v in het.state._asdict().items()}

    sand, clay, org = _profiles()
    for i in range(NCOL):
        homo = Model(ncol=1, vtype=PFTS[i], lat_deg=LATS[i],
                     lon_deg=LONS[i], soil_color=COLORS[i],
                     pct_sand=sand.T[i:i + 1], pct_clay=clay.T[i:i + 1],
                     organic=org.T[i:i + 1], topo_slope_raw=SLOPES[i],
                     topo_std=STDEVS[i])
        homo.run(Date(1985, 1, 1), NSTEP)
        for name, hv in homo.state._asdict().items():
            hv = np.asarray(hv)
            mv = het_state[name][i:i + 1]
            # pure vs mixed psn compiles differ by ulps inside the
            # iterative solvers; far tighter than any physical signal
            np.testing.assert_allclose(
                mv, hv, rtol=1e-6, atol=1e-8,
                err_msg=f"state.{name} col {i} (pft={PFTS[i]}, "
                        f"lat={LATS[i]}, color={COLORS[i]})")


def test_from_surfdata_columns_actually_differ(surfdata_path):
    m = Model.from_surfdata(surfdata_path, NCOL)
    # per-column grid really landed in params
    assert np.unique(np.asarray(m.params.lat_r)).size == NCOL
    assert np.unique(np.asarray(m.params.albsat)[:, 0]).size > 1
    assert np.unique(np.asarray(m.params.watsat)[:, 0]).size == NCOL
    # SLOPE/STD_ELEV landed: micro_sigma and n_melt vary per column
    assert np.unique(np.asarray(m.params.micro_sigma)).size == NCOL
    assert np.unique(np.asarray(m.params.n_melt)).size == NCOL
    m.run(Date(1985, 1, 1), NSTEP)
    assert np.unique(np.asarray(m.state.t_grnd)).size == NCOL


def test_organic_max_read_from_param_file():
    """organic_max defaults to the parameter-file value (reference
    ``soil_data_impl.hh:230-241``) — identical to the previous hardwired
    130.0 for the shipped clm_params fixture."""
    a = params_mod.default_params(2, DEFAULT_PFT_PATH)
    b = params_mod.default_params(2, DEFAULT_PFT_PATH, organic_max=130.0)
    np.testing.assert_array_equal(np.asarray(a.watsat),
                                  np.asarray(b.watsat))
    np.testing.assert_array_equal(np.asarray(a.tkdry), np.asarray(b.tkdry))
    c = params_mod.default_params(2, DEFAULT_PFT_PATH, organic_max=60.0)
    assert not np.array_equal(np.asarray(a.tkdry), np.asarray(c.tkdry))


def _write_aging_nc(path):
    rng = np.random.default_rng(7)
    shape = (11, 31, 8)
    tau = 1e3 + 1e3 * rng.random(shape)
    kappa = 1.0 + rng.random(shape)
    drdt0 = 1.0 + rng.random(shape)
    netcdf_io.write_nc(str(path),
                       {"T": 11, "Tgrd": 31, "rhos": 8},
                       {"tau": (("T", "Tgrd", "rhos"), tau),
                        "kappa": (("T", "Tgrd", "rhos"), kappa),
                        "drdsdt0": (("T", "Tgrd", "rhos"), drdt0)})
    return tau, kappa, drdt0


def test_snow_aging_path_feeds_tables(tmp_path):
    path = tmp_path / "snicar_drdt_bst_synth.nc"
    tau, kappa, drdt0 = _write_aging_nc(path)
    m = Model(ncol=1, snow_aging_path=str(path),
              elm_correct_snow_aging=True)
    np.testing.assert_allclose(np.asarray(m.params.snowage_tau), tau)
    np.testing.assert_allclose(np.asarray(m.params.snowage_kappa), kappa)
    np.testing.assert_allclose(np.asarray(m.params.snowage_drdt0), drdt0)
    # and the model runs end-to-end with the live aging pipeline
    d = m.run(Date(1985, 1, 1), 4)
    assert np.all(np.isfinite(np.asarray(m.state.snw_rds)))
    assert np.all(np.isfinite(np.asarray(d.eflx_sh_tot)))


def test_snow_aging_correct_mode_requires_real_tables():
    with pytest.raises(ValueError, match="snicar_drdt"):
        Model(ncol=1, elm_correct_snow_aging=True)


def test_snicar_nc_dispatch(tmp_path):
    """Model(snicar_path=*.nc) loads through read_snicar_data and
    reproduces the text-fixture tables (bc2 slots read the same bc_mam
    variables as bc1 — the reference's file contract)."""
    from test_snicar_netcdf import _write_optics_nc
    from elmkernels_tpu.data.params import load_snicar_from_text
    t = load_snicar_from_text("/root/reference/test/data/SnowOptics_IN.txt")
    path = tmp_path / "snicar_optics_5bnd_synth.nc"
    _write_optics_nc(path, t)
    m = Model(ncol=1, snicar_path=str(path))
    for field in t._fields:
        want = np.asarray(getattr(t, field[:-1] + "1")
                          if field.endswith("_bc2") else getattr(t, field))
        np.testing.assert_array_equal(np.asarray(getattr(m.snicar, field)),
                                      want, err_msg=field)


def test_global_surfdata_generator(tmp_path):
    """The committed global-surfdata generator (tools/
    make_global_surfdata.py) produces a file the production
    from_surfdata path loads: land-weighted latitudes, all 20 soil
    color classes, a mixed C3/C4 PFT map, per-column topography —
    the flagship BENCH_HETERO init (VERDICT r3 item 5)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from make_global_surfdata import write_surfdata

    from elmkernels_tpu import constants as c

    ncell = 256
    path = str(tmp_path / "surfdata_global.nc")
    write_surfdata(path, ncell)
    sd = read_surfdata(path, ncell)
    assert sd.lat_deg.min() < -40 and sd.lat_deg.max() > 70
    assert set(np.unique(sd.soil_color)) == set(range(1, 21))
    assert sd.vtype is not None
    assert c.NC4_GRASS in sd.vtype and c.NC3_ARCTIC_GRASS in sd.vtype
    assert sd.topo_slope is not None and sd.topo_std is not None
    assert sd.pct_sand.shape == (ncell, c.NLEVSOI)

    m = Model.from_surfdata(path, ncol=8, col0=64)
    # per-column site data flowed through: lat, texture-derived watsat,
    # and the mixed photosynthesis pathway compiled
    np.testing.assert_allclose(np.degrees(np.asarray(m.params.lat_r)),
                               sd.lat_deg[64:72], rtol=1e-12)
    assert m.psn_mode == "mixed" or len(set(sd.vtype[64:72])) == 1
    d = m.advance(Date.from_ymd(1985, 7, 1, 12 * 3600))
    assert np.all(np.isfinite(np.asarray(m.state.t_grnd)))
    assert float(np.abs(np.asarray(d.errh2o_led)).max()) < 1e-9
