"""Golden test for canopy_temperature (+qsat, +calc_soilevap_stress) vs the
reference kernels."""

import jax

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import canopy_temperature as ct
from elmkernels_tpu.utils.golden import GoldenFile, compare

from helpers import batch, batch_int, unbatch

LAND = c.LandType(ltype=1, ctype=1, vtype=12)


@jax.jit
def _step(a):
    old = ct.old_ground_temp(LAND, a["t_h2osfc"], a["t_soisno"])
    t_grnd = ct.ground_temp(LAND, a["snl"], a["frac_sno_eff"],
                            a["frac_h2osfc"], a["t_h2osfc"], a["t_soisno"])
    sa = ct.calc_soilalpha(LAND, a["frac_sno"], a["frac_h2osfc"],
                           a["h2osoi_liq"], a["h2osoi_ice"], a["dz"],
                           a["t_soisno"], a["watsat"], a["sucsat"], a["bsw"])
    soilbeta = ct.calc_soilbeta(LAND, a["frac_sno"], a["frac_h2osfc"],
                                a["watsat"], a["watfc"], a["h2osoi_liq"],
                                a["h2osoi_ice"], a["dz"])
    hum = ct.humidities(LAND, a["snl"], a["forc_q"], a["forc_pbot"],
                        a["t_h2osfc"], t_grnd, a["frac_sno"],
                        a["frac_sno_eff"], a["frac_h2osfc"], sa.qred, sa.hr,
                        a["t_soisno"])
    gp = ct.ground_properties(LAND, a["snl"], a["frac_sno"], a["forc_th"],
                              a["forc_q"], a["elai"], a["esai"], a["htop"],
                              a["displar"][:, LAND.vtype],
                              a["z0mr"][:, LAND.vtype], a["h2osoi_liq"],
                              a["h2osoi_ice"])
    fh = ct.forcing_height(LAND, a["veg_active"], a["frac_veg_nosno"],
                           gp.z0m, gp.z0mg, a["forc_t"], gp.displa,
                           a["forc_hgt_u"], a["forc_hgt_t"], a["forc_hgt_q"])
    ef = ct.init_energy_fluxes(LAND, t_grnd)
    return {
        "t_h2osfc_bef": old.t_h2osfc_bef, "tssbef": old.tssbef,
        "t_grnd": t_grnd, "qred": sa.qred, "hr": sa.hr,
        "soilalpha": sa.soilalpha, "soilbeta": soilbeta,
        "qg_snow": hum.qg_snow, "qg_soil": hum.qg_soil, "qg": hum.qg,
        "qg_h2osfc": hum.qg_h2osfc, "dqgdT": hum.dqgdT,
        "emg": gp.emg, "emv": gp.emv, "htvp": gp.htvp, "z0mg": gp.z0mg,
        "z0hg": gp.z0hg, "z0qg": gp.z0qg, "z0mv": gp.z0mv, "z0hv": gp.z0hv,
        "z0qv": gp.z0qv, "thv": gp.thv, "z0m": gp.z0m, "displa": gp.displa,
        "forc_hgt_u_patch": fh.forc_hgt_u_patch,
        "forc_hgt_t_patch": fh.forc_hgt_t_patch,
        "forc_hgt_q_patch": fh.forc_hgt_q_patch, "thm": fh.thm,
        "eflx_sh_tot": ef.eflx_sh_tot, "eflx_lh_tot": ef.eflx_lh_tot,
        "eflx_sh_veg": ef.eflx_sh_veg, "qflx_evap_tot": ef.qflx_evap_tot,
        "qflx_evap_veg": ef.qflx_evap_veg, "qflx_tran_veg": ef.qflx_tran_veg,
    }


FLOAT_KEYS = ["t_h2osfc", "frac_sno_eff", "frac_h2osfc", "frac_sno",
              "forc_q", "forc_pbot", "forc_th", "elai", "esai", "htop",
              "forc_t", "forc_hgt_u", "forc_hgt_t", "forc_hgt_q",
              "t_soisno", "h2osoi_liq", "h2osoi_ice", "dz", "watsat",
              "sucsat", "bsw", "watfc", "displar", "z0mr"]
INT_KEYS = ["veg_active", "snl", "frac_veg_nosno"]


def test_canopy_temperature_golden(golden_dirs):
    ref_data_dir, fixture_dir = golden_dirs
    gin = GoldenFile(str(ref_data_dir / "CanopyTemperature_IN.txt"))
    gref = GoldenFile(str(fixture_dir / "CanopyTemperature_REF.txt"))

    errors = []
    for t in gref.steps:
        blk = gin.state(t)
        a = {k: batch(blk, k) for k in FLOAT_KEYS}
        a.update({k: batch_int(blk, k) for k in INT_KEYS})
        got = _step(a)
        want = gref.state(t)
        for name, val in got.items():
            compare(f"step {t}: {name}", unbatch(val), want[name],
                    rtol=1e-12, atol=1e-15, errors=errors)
    assert not errors, "\n".join(errors)
