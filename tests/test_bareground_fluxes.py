"""Golden test for bareground_fluxes (+friction_velocity) vs the reference
kernels.  frac_veg_nosno is hardwired to 0, as in the reference test."""

import jax
import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import bareground_fluxes as bg
from elmkernels_tpu.utils.golden import GoldenFile, compare

from helpers import batch, batch_int, unbatch

LAND = c.LandType(ltype=1, ctype=1, vtype=12)


@jax.jit
def _step(a):
    z = jnp.zeros_like(a["thm"])
    frac_veg_nosno = jnp.zeros_like(a["snl"])
    init = bg.initialize_flux(
        LAND, frac_veg_nosno, a["forc_u"], a["forc_v"], a["forc_q"],
        a["forc_th"], a["forc_hgt_u_patch"], a["thm"], a["thv"], a["t_grnd"],
        a["qg"], a["z0mg"], a["dlrad"], a["ulrad"], z, z, z, z, z, z, z)
    stab = bg.stability_iteration(
        LAND, frac_veg_nosno, a["forc_hgt_t_patch"], a["forc_hgt_u_patch"],
        a["forc_hgt_q_patch"], a["z0mg"], init.zldis, init.displa, init.dth,
        init.dqh, init.ur, a["forc_q"], a["forc_th"], a["thv"], a["z0hg"],
        a["z0qg"], init.obu, init.um, z, z, z, z, z)
    cf = bg.compute_flux(
        LAND, frac_veg_nosno, a["snl"], a["forc_rho"], a["soilbeta"],
        a["dqgdT"], a["htvp"], a["t_h2osfc"], a["qg_snow"], a["qg_soil"],
        a["qg_h2osfc"], a["t_soisno"], a["forc_pbot"], init.dth, init.dqh,
        stab.temp1, stab.temp2, stab.temp12m, stab.temp22m, stab.ustar,
        a["forc_q"], a["thm"], a["eflx_sh_grnd"], a["eflx_sh_tot"],
        a["eflx_sh_snow"], a["eflx_sh_soil"], a["eflx_sh_h2osfc"],
        a["qflx_evap_soi"], a["qflx_evap_tot"], a["qflx_ev_snow"],
        a["qflx_ev_soil"], a["qflx_ev_h2osfc"], a["t_ref2m"], a["q_ref2m"],
        a["rh_ref2m"])
    out = {"dlrad": init.dlrad, "ulrad": init.ulrad, "zldis": init.zldis,
           "displa": init.displa, "dth": init.dth, "dqh": init.dqh,
           "obu": stab.obu, "ur": init.ur, "um": stab.um,
           "z0hg": stab.z0hg, "z0qg": stab.z0qg, "temp1": stab.temp1,
           "temp2": stab.temp2, "temp12m": stab.temp12m,
           "temp22m": stab.temp22m, "ustar": stab.ustar}
    out.update(cf._asdict())
    return out


FLOAT_KEYS = ["forc_u", "forc_v", "forc_q", "forc_th", "thm", "thv",
              "t_grnd", "qg", "z0mg", "dlrad", "ulrad", "forc_hgt_t_patch",
              "forc_hgt_u_patch", "forc_hgt_q_patch", "z0hg", "z0qg",
              "forc_rho", "soilbeta", "dqgdT", "htvp", "t_h2osfc", "qg_snow",
              "qg_soil", "qg_h2osfc", "forc_pbot", "eflx_sh_grnd",
              "eflx_sh_tot", "eflx_sh_snow", "eflx_sh_soil",
              "eflx_sh_h2osfc", "qflx_evap_soi", "qflx_evap_tot",
              "qflx_ev_snow", "qflx_ev_soil", "qflx_ev_h2osfc", "t_ref2m",
              "q_ref2m", "rh_ref2m", "t_soisno"]


def test_bareground_fluxes_golden(golden_dirs):
    ref_data_dir, fixture_dir = golden_dirs
    gin = GoldenFile(str(ref_data_dir / "BareGroundFluxes_IN.txt"))
    gref = GoldenFile(str(fixture_dir / "BareGroundFluxes_REF.txt"))

    errors = []
    for t in gref.steps:
        blk = gin.state(t)
        a = {k: batch(blk, k) for k in FLOAT_KEYS}
        a["snl"] = batch_int(blk, "snl")
        got = _step(a)
        want = gref.state(t)
        for name, val in got.items():
            compare(f"step {t}: {name}", unbatch(val), want[name],
                    rtol=1e-12, atol=1e-15, errors=errors)
    assert not errors, "\n".join(errors)
