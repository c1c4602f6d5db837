"""Parameter loading: PFT traits, SNICAR optics tables, soil-color albedo
tables, and default ModelParams assembly.

Replaces the reference's NetCDF parameter managers
(``/root/reference/src/data/pft_data.h``, ``snicar_data.h``,
``soil_data.h``).  NetCDF classic files are read via scipy; the SNICAR
optics can alternatively come from the reference's SnowOptics text fixture
(the only optics source shipped with the test data).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.data.state import ModelParams
from elmkernels_tpu.physics import init_state as ini
from elmkernels_tpu.physics import soil_texture as stx
from elmkernels_tpu.physics.photosynthesis import PFTPsnParams
from elmkernels_tpu.physics.snow_snicar import IDX_MIE_SNW_MX, SnicarTables
from elmkernels_tpu.physics.surface_albedo import PFTAlbParams
from elmkernels_tpu.utils.golden import GoldenFile

# 20-class soil albedo tables (reference: soil_data_impl.hh:5-140,
# originally from ELM's SurfaceAlbedoMod)
ALBSAT_20 = np.array([
    [0.25, 0.50], [0.23, 0.46], [0.21, 0.42], [0.20, 0.40], [0.19, 0.38],
    [0.18, 0.36], [0.17, 0.34], [0.16, 0.32], [0.15, 0.30], [0.14, 0.28],
    [0.13, 0.26], [0.12, 0.24], [0.11, 0.22], [0.10, 0.20], [0.09, 0.18],
    [0.08, 0.16], [0.07, 0.14], [0.06, 0.12], [0.05, 0.10], [0.04, 0.08]])
ALBDRY_20 = np.array([
    [0.36, 0.61], [0.34, 0.57], [0.32, 0.53], [0.31, 0.51], [0.30, 0.49],
    [0.29, 0.48], [0.28, 0.45], [0.27, 0.43], [0.26, 0.41], [0.25, 0.39],
    [0.24, 0.37], [0.23, 0.35], [0.22, 0.33], [0.20, 0.31], [0.18, 0.29],
    [0.16, 0.27], [0.14, 0.25], [0.12, 0.23], [0.10, 0.21], [0.08, 0.16]])

PSN_PARAM_NAMES = ["fnr", "act25", "kcha", "koha", "cpha", "vcmaxha",
                   "jmaxha", "tpuha", "lmrha", "vcmaxhd", "jmaxhd", "tpuhd",
                   "lmrhd", "lmrse", "qe", "theta_cj", "bbbopt", "mbbopt",
                   "c3psn", "slatop", "leafcn", "flnr", "fnitr", "dleaf",
                   "smpso", "smpsc"]


# The full 41-trait surface the reference reads (pft_data.h:20-96); traits
# beyond the ones the current step consumes are loaded into the table so
# crop/irrigation physics can gather them without another file pass.
PFT_TABLE_NAMES = PSN_PARAM_NAMES + [
    "rholvis", "rholnir", "rhosvis", "rhosnir", "taulvis", "taulnir",
    "tausvis", "tausnir", "xl", "roota_par", "rootb_par", "displar",
    "z0mr", "dsladlai", "leaf_long", "evergreen", "stress_decid",
    "season_decid"]


def load_pft_table(path: str) -> dict:
    """Read the per-PFT trait matrix from clm_params NetCDF: one
    ``[numpft]`` float array per trait plus the scalar ``tc_stress``.

    Reference: ``pft_data_impl.hh`` (``read_pft_data``), which reads 41
    trait arrays into ``PFTData``.
    """
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), mmap=False)
    table = {n: np.array(f.variables[n][:], dtype=np.float64)
             for n in PFT_TABLE_NAMES if n in f.variables}
    table["tc_stress"] = float(f.variables["tc_stress"][0])
    return table


def gather_pft_psn(table: dict, vtype: np.ndarray) -> PFTPsnParams:
    """Per-column photosynthesis traits: gather rows of the trait matrix
    by each column's PFT (the TPU analog of the reference's per-cell
    ``get_pft_psn(psn_pft[c], vtype[c])``, ``pft_data_impl.hh:60-96``)."""
    vt = np.asarray(vtype, np.int64)
    vals = [jnp.asarray(table[n][vt]) for n in PSN_PARAM_NAMES]
    vals.append(jnp.full(vt.shape, table["tc_stress"]))
    return PFTPsnParams(*vals)


def gather_pft_alb(table: dict, vtype: np.ndarray) -> PFTAlbParams:
    """Per-column albedo traits ([ncol, numrad] optics + [ncol] xl).
    Reference: ``pft_data_impl.hh:103-116`` (``get_pft_alb``)."""
    vt = np.asarray(vtype, np.int64)

    def band(pre):
        return jnp.stack([jnp.asarray(table[pre + "vis"][vt]),
                          jnp.asarray(table[pre + "nir"][vt])], axis=-1)
    return PFTAlbParams(rhol=band("rhol"), rhos=band("rhos"),
                        taul=band("taul"), taus=band("taus"),
                        xl=jnp.asarray(table["xl"][vt]))


def load_pft_psn(path: str, vtype: int) -> PFTPsnParams:
    """Photosynthesis traits for one PFT from clm_params NetCDF.

    Reference: ``pft_data_impl.hh:60-96`` (``get_pft_psn``).
    """
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), mmap=False)
    vals = [float(f.variables[n][vtype]) for n in PSN_PARAM_NAMES]
    vals.append(float(f.variables["tc_stress"][0]))
    return PFTPsnParams(*vals)


def load_pft_alb(path: str, vtype: int) -> PFTAlbParams:
    """Albedo traits for one PFT (as plain tuples, so the params are
    hashable and can be jit-static).  Reference:
    ``pft_data_impl.hh:103-116``."""
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), mmap=False)
    def v(name):
        return float(f.variables[name][vtype])
    return PFTAlbParams(
        rhol=(v("rholvis"), v("rholnir")),
        rhos=(v("rhosvis"), v("rhosnir")),
        taul=(v("taulvis"), v("taulnir")),
        taus=(v("tausvis"), v("tausnir")),
        xl=v("xl"))


def load_pft_roots(path: str, vtype: int) -> tuple[float, float]:
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), mmap=False)
    return (float(f.variables["roota_par"][vtype]),
            float(f.variables["rootb_par"][vtype]))


def load_pft_displar_z0mr(path: str, vtype: int) -> tuple[float, float]:
    from scipy.io import netcdf_file
    f = netcdf_file(str(path), mmap=False)
    return (float(f.variables["displar"][vtype]),
            float(f.variables["z0mr"][vtype]))


def load_snicar_from_text(path: str) -> SnicarTables:
    """SNICAR optics from the reference's SnowOptics text fixture
    (``/root/reference/test/data/SnowOptics_IN.txt``); same contents as
    snicar_optics_5bnd*.nc."""
    opt = GoldenFile(str(path)).state(0)
    def t(name, shape):
        return jnp.asarray(np.asarray(opt[name]).reshape(shape))
    kw = {}
    for sp in ("oc1", "oc2", "dst1", "dst2", "dst3", "dst4"):
        for pre in ("ss_alb", "asm_prm", "ext_cff_mss"):
            kw[f"{pre}_{sp}"] = t(f"{pre}_{sp}", (5,))
    for kind in ("drc", "dfs"):
        for pre in ("ss_alb", "asm_prm", "ext_cff_mss"):
            kw[f"{pre}_snw_{kind}"] = t(f"{pre}_snw_{kind}",
                                        (5, IDX_MIE_SNW_MX))
    for sp in ("bc1", "bc2"):
        for pre in ("ss_alb", "asm_prm", "ext_cff_mss"):
            kw[f"{pre}_{sp}"] = t(f"{pre}_{sp}", (10, 5))
    kw["bcenh"] = t("bcenh", (8, 10, 5))
    return SnicarTables(**kw)


def default_snow_aging_tables():
    """Plausible snow-aging tables [11, 31, 8] (the snicar_drdt NetCDF is
    not shipped with the reference test data; the reference's final
    radius clamp makes these numerically inert anyway)."""
    i = np.arange(11)[:, None, None]
    j = np.arange(31)[None, :, None]
    k = np.arange(8)[None, None, :]
    tau = 1000.0 + 30.0 * i + 10.0 * j + 50.0 * k + 0.0 * (i + j + k)
    kappa = 1.0 + 0.02 * i + 0.005 * j + 0.01 * k
    drdt0 = 1.0 + 0.05 * i + 0.01 * j + 0.02 * k
    return (jnp.asarray(np.broadcast_to(tau, (11, 31, 8)).copy()),
            jnp.asarray(np.broadcast_to(kappa, (11, 31, 8)).copy()),
            jnp.asarray(np.broadcast_to(drdt0, (11, 31, 8)).copy()))


def _per_column_profile(val, ncol: int, nlev: int, name: str,
                        dtype) -> jnp.ndarray:
    """Broadcast a scalar / [ncol] / [ncol, nlev] input to [ncol, nlev]
    (per-column soil heterogeneity enters here)."""
    a = np.asarray(val, np.float64)
    if a.ndim == 0:
        return jnp.full((ncol, nlev), float(a), dtype)
    if a.ndim == 1:
        if a.shape != (ncol,):
            raise ValueError(f"{name} shape {a.shape} != ({ncol},)")
        return jnp.broadcast_to(jnp.asarray(a, dtype)[:, None],
                                (ncol, nlev))
    if a.shape != (ncol, nlev):
        raise ValueError(f"{name} shape {a.shape} != ({ncol}, {nlev})")
    return jnp.asarray(a, dtype)


def _per_column(val, ncol: int, name: str, dtype) -> jnp.ndarray:
    a = np.asarray(val, np.float64)
    if a.ndim == 0:
        return jnp.full((ncol,), float(a), dtype)
    if a.shape != (ncol,):
        raise ValueError(f"{name} shape {a.shape} != ({ncol},)")
    return jnp.asarray(a, dtype)


def default_params(ncol: int, pft_path: str, vtype=12,
                   lat_deg=71.323, lon_deg=203.3886,
                   soil_color=15, pct_sand=40.0,
                   pct_clay=20.0, organic=10.0,
                   mxsoil_color: int = 20,
                   organic_max: float | None = None,
                   snowage_tables=None,
                   ltype=c.ISTSOIL,
                   topo_slope_raw=0.070044865858546,
                   topo_std=3.96141847422387,
                   dtype=jnp.float64) -> ModelParams:
    """Assemble ModelParams.  Defaults mirror the reference driver's
    hardwired site (``elm_kokkos_interface.cc:92-96``: Utqiagvik,
    topo_slope raw 0.070, topo_std 3.961) with pedotransfer-derived soil
    constants; every site argument (``vtype``, ``lat_deg``/``lon_deg``,
    ``soil_color``, ``pct_sand``/``pct_clay``/``organic``) also accepts
    an [ncol] (texture: or [ncol, nlevsoi]) array for a surfdata-driven
    heterogeneous grid (reference ``initialize_elm_kokkos.cc:267-340``,
    ``soil_data_impl.hh:139-241``).

    ``organic_max`` defaults to the value in the parameter NetCDF
    (reference ``soil_data_impl.hh:230-241``); ``snowage_tables`` is an
    optional (tau, kappa, drdt0) triple from ``read_snowrds_data`` —
    None keeps the synthetic placeholder tables (inert under the
    reference's double-clamp default)."""
    ones = jnp.ones((ncol,), dtype)
    vt = np.asarray(vtype, np.int32)
    heterog = vt.ndim > 0
    if heterog and vt.shape != (ncol,):
        raise ValueError(f"vtype shape {vt.shape} != ({ncol},)")

    # soil texture -> hydraulic/thermal constants
    zsoi_soil = jnp.asarray(np.array([
        0.007100635417193535, 0.02792500041531687, 0.06225857393654604,
        0.11886506690014327, 0.21219339590896316, 0.3660657971047043,
        0.6197584979298266, 1.0380270500015696, 1.7276353086671965,
        2.8646071131796917, 4.73915671146575, 7.829766507142356,
        12.92532061670855, 21.32646906315379, 35.17762120511739]))
    zsoi2 = jnp.broadcast_to(zsoi_soil, (ncol, c.NLEVGRND))
    sand = _per_column_profile(pct_sand, ncol, c.NLEVSOI, "pct_sand", dtype)
    clay = _per_column_profile(pct_clay, ncol, c.NLEVSOI, "pct_clay", dtype)
    org = _per_column_profile(organic, ncol, c.NLEVSOI, "organic", dtype)
    if organic_max is None:
        from elmkernels_tpu.data.soil_data import read_organic_max
        organic_max = read_organic_max(pft_path)
    hyd = stx.init_soil_hydraulics(organic_max, sand, clay, org, zsoi2)

    # topography factors (reference hardwired raw values); ltype may be
    # per-column — init_melt_factor branches through c.ltype_mask
    lt = np.asarray(ltype, np.int32)
    land = c.LandType(ltype=(int(lt) if lt.ndim == 0 else jnp.asarray(lt)),
                      ctype=1,
                      vtype=int(vt if not heterog else vt.flat[0]))
    topo_slope = ini.init_topo_slope(
        _per_column(topo_slope_raw, ncol, "topo_slope_raw", dtype))
    n_melt = ini.init_melt_factor(
        land, _per_column(topo_std, ncol, "topo_std", dtype))
    micro_sigma = ini.init_micro_sigma(topo_slope)

    # root fraction from PFT root distribution parameters
    if heterog:
        table = load_pft_table(pft_path)
        roota = jnp.asarray(table["roota_par"][vt])
        rootb = jnp.asarray(table["rootb_par"][vt])
    else:
        roota, rootb = load_pft_roots(pft_path, int(vt))
    zisoi_soil = jnp.asarray(np.array([
        0.0, 0.017512817916255204, 0.04509178717593146, 0.09056182041834465,
        0.16552923140455322, 0.28912959650683373, 0.4929121475172655,
        0.8288927739656982, 1.382831179334383, 2.2961212109234443,
        3.8018819123227208, 6.284461609304053, 10.377543561925453,
        17.12589483993117, 28.252045134135592, 42.10319727609919]))
    zi2 = jnp.broadcast_to(zisoi_soil, (ncol, c.NLEVGRND + 1))
    rootfr = ini.init_vegrootfr(vt if heterog else int(vt), roota, rootb,
                                zi2)
    if heterog:
        displar_v = jnp.asarray(table["displar"][vt]) * ones
        z0mr_v = jnp.asarray(table["z0mr"][vt]) * ones
    else:
        d_, z_ = load_pft_displar_z0mr(pft_path, int(vt))
        displar_v, z0mr_v = d_ * ones, z_ * ones
    if snowage_tables is None:
        tau, kappa, drdt0 = default_snow_aging_tables()
    else:
        tau, kappa, drdt0 = (jnp.asarray(t) for t in snowage_tables)
    zsmall = 1.0e-12 * ones

    # soil-color albedo: scalar or [ncol] color classes against the 8- or
    # 20-class table (reference read_soil_colors, soil_data_impl.hh:139)
    from elmkernels_tpu.data import soil_data
    color = np.asarray(soil_color, np.int64)
    color = np.broadcast_to(color, (ncol,))
    idx = np.clip(color - 1, 0, mxsoil_color - 1)
    albsat = jnp.asarray(soil_data.get_albsat(mxsoil_color)[idx], dtype)
    albdry = jnp.asarray(soil_data.get_albdry(mxsoil_color)[idx], dtype)

    return ModelParams(
        lat_r=_per_column(np.asarray(lat_deg, np.float64) * c.ELM_PI
                          / 180.0, ncol, "lat_deg", dtype),
        lon_r=_per_column(np.asarray(lon_deg, np.float64) * c.ELM_PI
                          / 180.0, ncol, "lon_deg", dtype),
        vtype=jnp.asarray(np.broadcast_to(vt, (ncol,)).copy()),
        ltype=jnp.asarray(np.broadcast_to(lt, (ncol,)).copy()),
        watsat=hyd.watsat, sucsat=hyd.sucsat, bsw=hyd.bsw,
        watdry=hyd.watdry, watopt=hyd.watopt, watfc=hyd.watfc,
        tkmg=hyd.tkmg, tkdry=hyd.tkdry, csol=hyd.csol, rootfr=rootfr,
        micro_sigma=micro_sigma, n_melt=n_melt,
        displar_v=displar_v, z0mr_v=z0mr_v,
        albsat=albsat, albdry=albdry,
        snowage_tau=tau, snowage_kappa=kappa, snowage_drdt0=drdt0,
        aero_bcphi=zsmall, aero_bcpho=zsmall, aero_bcdep=zsmall,
        aero_dst1_1=zsmall, aero_dst1_2=zsmall, aero_dst2_1=zsmall,
        aero_dst2_2=zsmall, aero_dst3_1=zsmall, aero_dst3_2=zsmall,
        aero_dst4_1=zsmall, aero_dst4_2=zsmall)
