"""Golden test for canopy_fluxes + photosynthesis + soil_moist_stress vs
the reference kernels (96 steps)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import netcdf_file

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import canopy_fluxes as cfx
from elmkernels_tpu.physics import photosynthesis as psn
from elmkernels_tpu.utils.golden import GoldenFile, compare

from helpers import batch, batch_int, unbatch

LAND = c.LandType(ltype=1, ctype=1, vtype=12)
DTIME = 1800.0


def load_psn_params(path, vtype=12):
    f = netcdf_file(str(path), mmap=False)
    names = ["fnr", "act25", "kcha", "koha", "cpha", "vcmaxha", "jmaxha",
             "tpuha", "lmrha", "vcmaxhd", "jmaxhd", "tpuhd", "lmrhd",
             "lmrse", "qe", "theta_cj", "bbbopt", "mbbopt", "c3psn",
             "slatop", "leafcn", "flnr", "fnitr", "dleaf", "smpso", "smpsc"]
    vals = [float(f.variables[n][vtype]) for n in names]
    vals.append(float(f.variables["tc_stress"][0]))
    return psn.PFTPsnParams(*vals)


def make_step(p):
    @jax.jit
    def _step(a):
        init = cfx.initialize_flux(
            LAND, p, a["snl"], a["frac_veg_nosno"], a["frac_sno"],
            a["forc_hgt_u_patch"], a["thm"], a["thv"], a["max_dayl"],
            a["dayl"], a["altmax_indx"], a["altmax_lastyear_indx"],
            a["t_soisno"], a["h2osoi_ice"], a["h2osoi_liq"], a["dz"],
            a["rootfr"], a["sucsat"], a["watsat"], a["bsw"], a["elai"],
            a["esai"], a["emv"], a["emg"], a["qg"], a["t_grnd"],
            a["forc_t"], a["forc_pbot"], a["forc_lwrad"], a["forc_u"],
            a["forc_v"], a["forc_q"], a["forc_th"], a["z0mg"], a["displa"],
            a["z0mv"], a["t_veg"])
        st = cfx.stability_iteration(
            LAND, p, DTIME, a["snl"], a["frac_veg_nosno"], a["frac_sno"],
            a["forc_hgt_u_patch"], a["forc_hgt_t_patch"],
            a["forc_hgt_q_patch"], a["fwet"], a["fdry"], a["laisun"],
            a["laisha"], a["forc_rho"], a["snow_depth"], a["soilbeta"],
            a["frac_h2osfc"], a["t_h2osfc"], a["sabv"], a["h2ocan"],
            a["htop"], a["t_soisno"], init.air, init.bir, init.cir, init.ur,
            init.zldis, init.displa, a["elai"], a["esai"], a["t_grnd"],
            a["forc_pbot"], a["forc_q"], a["forc_th"], a["z0mg"], init.z0mv,
            init.z0hv, init.z0qv, a["thm"], a["thv"], a["qg"], a["nrad"],
            a["t10"], a["tlai_z"], a["vcmaxcintsha"], a["vcmaxcintsun"],
            a["parsha_z"], a["parsun_z"], a["laisha_z"], a["laisun_z"],
            a["forc_pco2"], a["forc_po2"], init.dayl_factor, init.btran,
            init.el, init.qsatl, init.qsatldT, init.taf, init.qaf, init.um,
            init.obu, init.delq, init.t_veg,
            soybean=LAND.vtype in (c.NSOYBEAN, c.NSOYBEANIRRIG))
        cf = cfx.compute_flux(
            LAND, DTIME, a["snl"], a["frac_veg_nosno"], a["frac_sno"],
            a["t_soisno"], a["frac_h2osfc"], a["t_h2osfc"], a["sabv"],
            a["qg_snow"], a["qg_soil"], a["qg_h2osfc"], a["dqgdT"],
            a["htvp"], st.wtg, st.wtl0, st.wta0, st.wtal, init.air,
            init.bir, init.cir, st.qsatl, st.qsatldT, st.dth, st.dqh,
            st.temp1, st.temp2, st.temp12m, st.temp22m, st.tlbef, st.delq,
            st.dt_veg, st.t_veg, a["t_grnd"], a["forc_pbot"],
            st.qflx_tran_veg, st.qflx_evap_veg, st.eflx_sh_veg, a["forc_q"],
            a["forc_rho"], a["thm"], a["emv"], a["emg"], a["forc_lwrad"],
            st.wtgq, st.wtalq, st.wtlq0, st.wtaq0, a["h2ocan"],
            a["eflx_sh_grnd"], a["eflx_sh_snow"], a["eflx_sh_soil"],
            a["eflx_sh_h2osfc"], a["qflx_evap_soi"], a["qflx_ev_snow"],
            a["qflx_ev_soil"], a["qflx_ev_h2osfc"], a["dlrad"], a["ulrad"],
            a["t_ref2m"], a["q_ref2m"], a["rh_ref2m"])
        return {
            "btran": st.btran, "displa": init.displa, "z0mv": init.z0mv,
            "z0hv": init.z0hv, "z0qv": init.z0qv, "rootr": init.rootr,
            "eff_porosity": init.eff_porosity,
            "dayl_factor": init.dayl_factor, "t_veg": st.t_veg,
            "qflx_tran_veg": st.qflx_tran_veg,
            "qflx_evap_veg": st.qflx_evap_veg,
            "eflx_sh_veg": st.eflx_sh_veg,
            "h2ocan": cf.h2ocan, "eflx_sh_grnd": cf.eflx_sh_grnd,
            "eflx_sh_snow": cf.eflx_sh_snow,
            "eflx_sh_soil": cf.eflx_sh_soil,
            "eflx_sh_h2osfc": cf.eflx_sh_h2osfc,
            "qflx_evap_soi": cf.qflx_evap_soi,
            "qflx_ev_snow": cf.qflx_ev_snow,
            "qflx_ev_soil": cf.qflx_ev_soil,
            "qflx_ev_h2osfc": cf.qflx_ev_h2osfc,
            "dlrad": cf.dlrad, "ulrad": cf.ulrad, "cgrnds": cf.cgrnds,
            "cgrndl": cf.cgrndl, "cgrnd": cf.cgrnd, "t_ref2m": cf.t_ref2m,
            "q_ref2m": cf.q_ref2m, "rh_ref2m": cf.rh_ref2m,
            "wtg": st.wtg, "wtl0": st.wtl0, "wta0": st.wta0,
            "wtal": st.wtal, "wtgq": st.wtgq, "wtalq": st.wtalq,
            "wtlq0": st.wtlq0, "wtaq0": st.wtaq0, "taf": st.taf,
            "qaf": st.qaf, "um": st.um, "obu": st.obu, "dth": st.dth,
            "dqh": st.dqh, "delq": st.delq, "el": st.el,
            "qsatl": st.qsatl, "qsatldT": st.qsatldT, "temp1": st.temp1,
            "temp2": st.temp2, "temp12m": st.temp12m,
            "temp22m": st.temp22m, "tlbef": st.tlbef, "dt_veg": st.dt_veg,
        }
    return _step


FLOAT_KEYS = ["frac_sno", "forc_hgt_u_patch", "thm", "thv", "max_dayl",
              "dayl", "elai", "esai", "emv", "emg", "qg", "t_grnd",
              "forc_t", "forc_pbot", "forc_lwrad", "forc_u", "forc_v",
              "forc_q", "forc_th", "z0mg", "btran", "displa", "z0mv",
              "z0hv", "z0qv", "t_veg", "forc_hgt_t_patch",
              "forc_hgt_q_patch", "fwet", "fdry", "laisun", "laisha",
              "forc_rho", "snow_depth", "soilbeta", "frac_h2osfc",
              "t_h2osfc", "sabv", "h2ocan", "htop", "t10", "vcmaxcintsha",
              "vcmaxcintsun", "forc_pco2", "forc_po2", "qflx_tran_veg",
              "qflx_evap_veg", "eflx_sh_veg", "qg_snow", "qg_soil",
              "qg_h2osfc", "dqgdT", "htvp", "eflx_sh_grnd", "eflx_sh_snow",
              "eflx_sh_soil", "eflx_sh_h2osfc", "qflx_evap_soi",
              "qflx_ev_snow", "qflx_ev_soil", "qflx_ev_h2osfc", "dlrad",
              "ulrad", "cgrnds", "cgrndl", "cgrnd", "t_ref2m", "q_ref2m",
              "rh_ref2m", "tlai_z", "parsha_z", "parsun_z", "laisha_z",
              "laisun_z", "t_soisno", "h2osoi_ice", "h2osoi_liq", "dz",
              "rootfr", "sucsat", "watsat", "bsw"]
INT_KEYS = ["snl", "frac_veg_nosno", "nrad", "altmax_indx",
            "altmax_lastyear_indx"]


def test_canopy_fluxes_golden(golden_dirs, ref_data_dir):
    _in_dir, fixture_dir = golden_dirs
    p = load_psn_params(ref_data_dir / "clm_params_c180524.nc")
    gin = GoldenFile(str(_in_dir / "CanopyFluxes_IN.txt"))
    gref = GoldenFile(str(fixture_dir / "CanopyFluxes_REF.txt"))
    step = make_step(p)

    errors = []
    for t in gref.steps:
        blk = gin.state(t)
        a = {k: batch(blk, k) for k in FLOAT_KEYS}
        a.update({k: batch_int(blk, k) for k in INT_KEYS})
        # canopy-layer variables have nlevcan == 1 and parse as scalars;
        # restore the layer axis
        for k in ("tlai_z", "parsha_z", "parsun_z", "laisha_z", "laisun_z"):
            if a[k].ndim == 1:
                a[k] = a[k][:, None]
        got = step(a)
        want = gref.state(t)
        for name, val in got.items():
            compare(f"step {t}: {name}", unbatch(val), want[name],
                    rtol=1e-10, atol=1e-12, errors=errors)
        if len(errors) > 30:
            break
    assert not errors, "\n".join(errors[:30])
