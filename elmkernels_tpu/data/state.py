"""Model state pytrees, grouped by lifetime.

Replaces the reference's monolithic ``ELMState`` (~150 views,
``/root/reference/src/data/elm_state.h:52-225``) with:

- :class:`ModelState` — everything that must persist step-to-step
  (superset of the reference's ``PrimaryVars`` restart set,
  ``elm_state.h:17-48``, which is exactly the checkpoint schema).
- :class:`ModelParams` — static per-column parameters (soil hydraulics,
  PFT traits, topography factors, optics tables).

All arrays carry the column axis first, so the whole state shards over a
device mesh with ``NamedSharding(mesh, P("col", ...))``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.photosynthesis import PFTPsnParams
from elmkernels_tpu.physics.snow_snicar import SnicarTables
from elmkernels_tpu.physics.surface_albedo import PFTAlbParams

AERO_SPECIES = ("bcphi", "bcpho", "dst1", "dst2", "dst3", "dst4")

# deposition-rate keys, in the order StepForcing.aero stacks them
# (reference AerosolFileInput, aerosol_data.h:10-27)
AERO_DEP_KEYS = ("bcphi", "bcpho", "bcdep", "dst1_1", "dst1_2", "dst2_1",
                 "dst2_2", "dst3_1", "dst3_2", "dst4_1", "dst4_2")


class ModelState(NamedTuple):
    """Prognostic + carried state, [ncol, ...] arrays."""
    # snow pack
    snl: jnp.ndarray            # i32 [ncol] active snow layers
    snow_depth: jnp.ndarray
    frac_sno: jnp.ndarray
    frac_sno_eff: jnp.ndarray
    int_snow: jnp.ndarray
    h2osno: jnp.ndarray
    snw_rds: jnp.ndarray        # [ncol, NLEVSNO]
    # water state
    h2ocan: jnp.ndarray
    h2osfc: jnp.ndarray
    frac_h2osfc: jnp.ndarray
    h2osoi_liq: jnp.ndarray     # [ncol, NLEVTOT]
    h2osoi_ice: jnp.ndarray
    h2osoi_vol: jnp.ndarray     # [ncol, NLEVGRND]
    # temperatures
    t_soisno: jnp.ndarray       # [ncol, NLEVTOT]
    t_grnd: jnp.ndarray
    t_h2osfc: jnp.ndarray
    t_veg: jnp.ndarray
    t10: jnp.ndarray
    # mesh (snow part evolves)
    dz: jnp.ndarray             # [ncol, NLEVTOT]
    z: jnp.ndarray
    zi: jnp.ndarray             # [ncol, NLEVTOT+1]
    # aerosols in snow
    mss_bcphi: jnp.ndarray      # [ncol, NLEVSNO] each
    mss_bcpho: jnp.ndarray
    mss_dst1: jnp.ndarray
    mss_dst2: jnp.ndarray
    mss_dst3: jnp.ndarray
    mss_dst4: jnp.ndarray
    cnc_bcphi: jnp.ndarray
    cnc_bcpho: jnp.ndarray
    cnc_dst1: jnp.ndarray
    cnc_dst2: jnp.ndarray
    cnc_dst3: jnp.ndarray
    cnc_dst4: jnp.ndarray
    # fluxes carried across steps (used by next step's snow_water/snow_init)
    qflx_snow_melt: jnp.ndarray
    qflx_sub_snow: jnp.ndarray
    qflx_evap_grnd: jnp.ndarray
    qflx_dew_snow: jnp.ndarray
    qflx_dew_grnd: jnp.ndarray
    # solver warm-start carries (zeros = cold; only read when the opt-in
    # warm_start perf mode is on — see canopy_fluxes.stability_iteration)
    ci_sun: jnp.ndarray         # previous-step sunlit ci roots (Pa)
    ci_sha: jnp.ndarray         # previous-step shaded ci roots (Pa)
    obu_can: jnp.ndarray        # previous-step canopy Monin-Obukhov length

    @property
    def mss(self) -> dict:
        return {k: getattr(self, "mss_" + k) for k in AERO_SPECIES}

    @property
    def cnc(self) -> dict:
        return {k: getattr(self, "cnc_" + k) for k in AERO_SPECIES}

    def with_mss(self, mss: dict, cnc: dict | None = None) -> "ModelState":
        kw = {"mss_" + k: v for k, v in mss.items()}
        if cnc is not None:
            kw.update({"cnc_" + k: v for k, v in cnc.items()})
        return self._replace(**kw)


class ModelParams(NamedTuple):
    """Static per-column parameters + lookup tables."""
    lat_r: jnp.ndarray          # [ncol] latitude (radians)
    lon_r: jnp.ndarray
    # vegetation (PFT) type per column (reference keeps vtype per cell in
    # ELMState; land_data.h's LandType carries only the domain default)
    vtype: jnp.ndarray          # i32 [ncol]
    # landunit type per column (ISTSOIL/ISTCROP/ISTWET/ISTICE/...) — the
    # TPU-first upgrade over the reference's one-LandType-per-domain
    # placeholder; consumed only when the model runs with het_ltype
    ltype: jnp.ndarray          # i32 [ncol]
    # soil hydraulic/thermal constants [ncol, NLEVGRND]
    watsat: jnp.ndarray
    sucsat: jnp.ndarray
    bsw: jnp.ndarray
    watdry: jnp.ndarray
    watopt: jnp.ndarray
    watfc: jnp.ndarray
    tkmg: jnp.ndarray
    tkdry: jnp.ndarray
    csol: jnp.ndarray
    rootfr: jnp.ndarray
    # topography-derived
    micro_sigma: jnp.ndarray    # [ncol]
    n_melt: jnp.ndarray
    # PFT traits for the active vtype (canopy_temperature roughness)
    displar_v: jnp.ndarray      # [ncol] (or scalar)
    z0mr_v: jnp.ndarray
    # soil albedo by color class [ncol, numrad]
    albsat: jnp.ndarray
    albdry: jnp.ndarray
    # snow aging tables [11, 31, 8]
    snowage_tau: jnp.ndarray
    snowage_kappa: jnp.ndarray
    snowage_drdt0: jnp.ndarray
    # aerosol deposition rates [ncol] each (steady for now)
    aero_bcphi: jnp.ndarray
    aero_bcpho: jnp.ndarray
    aero_bcdep: jnp.ndarray
    aero_dst1_1: jnp.ndarray
    aero_dst1_2: jnp.ndarray
    aero_dst2_1: jnp.ndarray
    aero_dst2_2: jnp.ndarray
    aero_dst3_1: jnp.ndarray
    aero_dst3_2: jnp.ndarray
    aero_dst4_1: jnp.ndarray
    aero_dst4_2: jnp.ndarray

    @property
    def aero_in(self) -> dict:
        return {k: getattr(self, "aero_" + k)
                for k in ("bcphi", "bcpho", "bcdep", "dst1_1", "dst1_2",
                          "dst2_1", "dst2_2", "dst3_1", "dst3_2", "dst4_1",
                          "dst4_2")}


class StepForcing(NamedTuple):
    """One step of atmospheric forcing: raw bracketing samples + weights
    (interpolation happens on device inside the step, mirroring the
    reference's ``get_atm_forcing``)."""
    wt1: jnp.ndarray            # scalar weights
    wt2: jnp.ndarray
    tbot: jnp.ndarray           # [2, ncol]
    pbot: jnp.ndarray
    qbot: jnp.ndarray
    flds: jnp.ndarray
    wind: jnp.ndarray
    fsds: jnp.ndarray           # [ncol] (piecewise constant)
    prec: jnp.ndarray           # [ncol]
    decday: jnp.ndarray         # scalar decimal day-of-year (1-based);
                                # solar geometry (coszen/daylength) is
                                # derived on device inside the step
    # monthly-interpolated aerosol deposition rates, [11, ncol] stacked in
    # AERO_DEP_KEYS order (reference AerosolDataManager,
    # aerosol_data_old.h:78-); None falls back to the static
    # ModelParams.aero_* rates
    aero: jnp.ndarray | None = None


class StepPhenology(NamedTuple):
    """Bracketing monthly phenology slices + weights."""
    wt1: jnp.ndarray
    wt2: jnp.ndarray
    mlai: jnp.ndarray           # [2, ncol]
    msai: jnp.ndarray
    mhtop: jnp.ndarray
    mhbot: jnp.ndarray


def cold_start(ncol: int, dtype=jnp.float64) -> ModelState:
    """The reference driver's hardwired initial condition, replicated per
    column (``elm_kokkos_interface.cc:58-266``)."""
    dz_hw = np.array([
        0.0, 0.0, 0.0, 0.0, 0.0, 0.017512817916255204,
        0.02757896925967625, 0.0454700332424132, 0.07496741098620856,
        0.12360036510228053, 0.20378255101043175, 0.33598062644843263,
        0.5539384053686849, 0.9132900315890611, 1.5057607013992766,
        2.482579696981332, 4.0930819526214, 6.7483512780057175,
        11.12615029420442, 13.851152141963599])
    zsoi_hw = np.array([
        0.0, 0.0, 0.0, 0.0, 0.0, 0.007100635417193535,
        0.02792500041531687, 0.06225857393654604, 0.11886506690014327,
        0.21219339590896316, 0.3660657971047043, 0.6197584979298266,
        1.0380270500015696, 1.7276353086671965, 2.8646071131796917,
        4.73915671146575, 7.829766507142356, 12.92532061670855,
        21.32646906315379, 35.17762120511739])
    zisoi_hw = np.array([
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        0.017512817916255204, 0.04509178717593146, 0.09056182041834465,
        0.16552923140455322, 0.28912959650683373, 0.4929121475172655,
        0.8288927739656982, 1.382831179334383, 2.2961212109234443,
        3.8018819123227208, 6.284461609304053, 10.377543561925453,
        17.12589483993117, 28.252045134135592, 42.10319727609919])
    ice_hw = np.array([
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        51.095355179469955, 131.99213225849098, 17.829256395227745,
        95.72899575304584, 155.31526899797177, 0.01, 0.01, 0.01, 0.01,
        0.01])
    liq_hw = np.array([
        0.0, 0.0, 0.0, 0.0, 0.0, 7.045411435071487, 14.353496179256807,
        36.308518784697064, 62.46145027256513, 97.14000248023912,
        97.47148319510016, 78.52160092062527, 65.63904088905001,
        41.25305599181871, 70.8566046019581, 0.01, 0.01, 0.01, 0.01, 0.01])
    vol_hw = np.array([
        0.4016484663460637, 0.5196481455614503, 0.7967166638201649,
        0.8331813710901114, 0.7859200286330449, 0.7517405589446893,
        0.6621235242027332, 0.1535948180493002, 0.15947477948341815,
        0.15954052527228618, 8.420726808634413e-06, 5.107428986500891e-06,
        3.0978122726178113e-06, 1.8789181213767733e-06,
        1.5092697845407248e-06])
    tsoi_hw = np.array([
        0.0, 0.0, 0.0, 0.0, 0.0, 278.3081064745931, 276.1568781897738,
        275.55803480737063, 275.2677090940866, 274.7286996980052, 273.15,
        272.4187794248787, 270.65049816473027, 267.8224112387398,
        265.7450135695632, 264.49481140089864, 264.14163363048056,
        264.3351872934207, 264.1163763444719, 263.88852987294865])

    def rep(a):
        # np.tile rather than broadcast so every field owns a distinct
        # buffer (the step donates the state; aliased buffers cannot be
        # donated twice)
        return jnp.asarray(np.tile(np.asarray(a, np.float64),
                                   (ncol, 1)), dtype)

    def z1():
        return jnp.zeros((ncol,), dtype)

    def z5():
        return jnp.zeros((ncol, c.NLEVSNO), dtype)

    return ModelState(
        snl=jnp.zeros((ncol,), jnp.int32),
        snow_depth=z1(), frac_sno=z1(), frac_sno_eff=z1(), int_snow=z1(),
        h2osno=z1(), snw_rds=z5(), h2ocan=z1(), h2osfc=z1(),
        frac_h2osfc=z1(),
        h2osoi_liq=rep(liq_hw), h2osoi_ice=rep(ice_hw),
        h2osoi_vol=rep(vol_hw), t_soisno=rep(tsoi_hw),
        t_grnd=jnp.full((ncol,), tsoi_hw[c.NLEVSNO], dtype),
        t_h2osfc=jnp.full((ncol,), 274.0, dtype),
        t_veg=jnp.full((ncol,), 283.0, dtype),
        t10=jnp.full((ncol,), 276.0, dtype),
        dz=rep(dz_hw), z=rep(zsoi_hw), zi=rep(zisoi_hw),
        mss_bcphi=z5(), mss_bcpho=z5(), mss_dst1=z5(), mss_dst2=z5(),
        mss_dst3=z5(), mss_dst4=z5(), cnc_bcphi=z5(), cnc_bcpho=z5(),
        cnc_dst1=z5(), cnc_dst2=z5(), cnc_dst3=z5(), cnc_dst4=z5(),
        qflx_snow_melt=z1(), qflx_sub_snow=z1(), qflx_evap_grnd=z1(),
        qflx_dew_snow=z1(), qflx_dew_grnd=z1(),
        ci_sun=z1(), ci_sha=z1(), obu_can=z1())
