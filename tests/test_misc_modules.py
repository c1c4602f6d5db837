"""Golden tests for surface_fluxes, conservation, solar geometry, init_*
cold-start kernels, soil-texture pedotransfer, and atm_physics functors vs
the reference kernels (fixture: tests/data/Misc_REF.txt)."""

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import atm_physics as ap
from elmkernels_tpu.physics import conservation as ce
from elmkernels_tpu.physics import init_state as ini
from elmkernels_tpu.physics import soil_texture as stx
from elmkernels_tpu.physics import solar
from elmkernels_tpu.physics import surface_fluxes as sf
from elmkernels_tpu.utils.golden import GoldenFile, compare

LAND = c.LandType(ltype=1, ctype=1, vtype=12)
DTIME = 1800.0


@jax.jit
def _chain(a):
    out = {}
    snl = a["snl"]

    init = sf.initial_flux_calc(
        LAND, snl, a["frac_sno_eff"], a["frac_h2osfc"], a["t_h2osfc_bef"],
        a["tssbef_snotop"], a["tssbef_soitop"], a["t_grnd"], a["cgrnds"],
        a["cgrndl"], a["eflx_sh_grnd"], a["qflx_evap_soi"],
        a["qflx_ev_snow"], a["qflx_ev_soil"], a["qflx_ev_h2osfc"])
    upd = sf.update_surface_fluxes(
        LAND, a["do_capsnow"], snl, DTIME, a["t_grnd"], a["htvp"],
        a["frac_sno_eff"], a["frac_h2osfc"], a["t_h2osfc_bef"],
        a["sabg_soil"], a["sabg_snow"], a["dlrad"], a["frac_veg_nosno"],
        a["emg"], a["forc_lwrad"], a["tssbef_snotop"], a["tssbef_soitop"],
        a["h2osoi_ice_snotop"], a["h2osoi_liq_snotop"], a["eflx_sh_veg"],
        a["qflx_evap_veg"], init.qflx_evap_soi, init.eflx_sh_grnd,
        init.qflx_ev_snow, init.qflx_ev_soil, init.qflx_ev_h2osfc,
        a["qflx_snwcp_liq"], a["qflx_snwcp_ice"])
    lw = sf.lwrad_outgoing(
        LAND, snl, a["frac_veg_nosno"], a["forc_lwrad"], a["frac_sno_eff"],
        a["tssbef_snotop"], a["tssbef_soitop"], a["frac_h2osfc"],
        a["t_h2osfc_bef"], a["t_grnd"], a["ulrad"], a["emg"])
    out.update(
        eflx_sh_grnd=upd.eflx_sh_grnd, qflx_evap_soi=upd.qflx_evap_soi,
        qflx_ev_snow=upd.qflx_ev_snow, qflx_ev_soil=upd.qflx_ev_soil,
        qflx_ev_h2osfc=upd.qflx_ev_h2osfc,
        eflx_soil_grnd=upd.eflx_soil_grnd, eflx_sh_tot=upd.eflx_sh_tot,
        qflx_evap_tot=upd.qflx_evap_tot, eflx_lh_tot=upd.eflx_lh_tot,
        qflx_evap_grnd=upd.qflx_evap_grnd, qflx_sub_snow=upd.qflx_sub_snow,
        qflx_dew_snow=upd.qflx_dew_snow, qflx_dew_grnd=upd.qflx_dew_grnd,
        qflx_snwcp_liq=upd.qflx_snwcp_liq,
        qflx_snwcp_ice=upd.qflx_snwcp_ice,
        eflx_lwrad_out=lw.eflx_lwrad_out, eflx_lwrad_net=lw.eflx_lwrad_net)

    out["column_water_mass"] = ce.column_water_mass(
        a["h2ocan"], a["h2osno_c"], a["h2osfc_c"], a["ice"], a["liq"])
    out["snow_water_balance_error"] = ce.snow_water_balance_error(
        snl, upd.qflx_dew_snow, upd.qflx_dew_grnd, upd.qflx_sub_snow,
        upd.qflx_evap_grnd, 1.0e-6 * a["cse"], upd.qflx_snwcp_ice,
        upd.qflx_snwcp_liq, jnp.full_like(a["t_grnd"], 2.0e-6),
        a["frac_sno_eff"], jnp.full_like(a["t_grnd"], 3.0e-5),
        jnp.full_like(a["t_grnd"], 2.0e-5),
        jnp.full_like(a["t_grnd"], 1.0e-6), a["h2osno_c"],
        a["h2osno_c"] - 0.01, DTIME, a["do_capsnow"])
    out["surface_energy_balance_error"] = ce.surface_energy_balance_error(
        50.0 + a["cse"], jnp.full_like(a["t_grnd"], 30.0), a["forc_lwrad"],
        lw.eflx_lwrad_out, upd.eflx_sh_tot, upd.eflx_lh_tot,
        upd.eflx_soil_grnd)

    out["coszen"] = solar.coszen(a["latrad"], a["lonrad"], a["jday"])
    out["avg_cosz"] = solar.average_cosz(a["latrad"], a["lonrad"], DTIME,
                                         a["jday"])
    decl = solar.declination_angle_sin(jnp.floor(a["jday"]))
    out["declination"] = decl
    out["daylength"] = solar.daylength(a["latrad"] * 0.9, decl * 0.9,
                                       elm_clamp_quirk=True)
    out["max_daylength"] = solar.max_daylength(a["latrad"] * 0.9,
                                               elm_clamp_quirk=True)

    isl = ini.init_snow_layers(a["snow_depth0"], False)
    out["init_snl"] = isl.snl
    out["init_dz"] = isl.dz
    out["init_z"] = isl.z
    out["init_zi"] = isl.zi
    out["init_topo_slope"] = ini.init_topo_slope(0.1 + 0.05 * a["cse"])
    out["init_melt_factor"] = ini.init_melt_factor(LAND, 5.0 + 3.0 * a["cse"])
    out["init_micro_sigma"] = ini.init_micro_sigma(0.1 + 0.05 * a["cse"])

    hyd = stx.init_soil_hydraulics(130.0, a["sand"], a["clay"],
                                   a["organic"], a["zsoi"][:, c.NLEVSNO:])
    out.update(watsat=hyd.watsat, bsw=hyd.bsw, sucsat=hyd.sucsat,
               watdry=hyd.watdry, watopt=hyd.watopt, watfc=hyd.watfc,
               tkmg=hyd.tkmg, tkdry=hyd.tkdry, csol=hyd.csol)
    out["rootfr"] = ini.init_vegrootfr(LAND.vtype, a["roota"], a["rootb"],
                                       a["zi_full"][:, c.NLEVSNO:])

    # atm physics
    wt1 = a["wt1"]
    wt2 = 1.0 - wt1
    forc_t, _ = ap.process_tbot(wt1, wt2, a["tb"][:, 0], a["tb"][:, 1])
    forc_p = ap.process_pbot(wt1, wt2, a["pb"][:, 0], a["pb"][:, 1])
    forc_q = ap.process_qbot(wt1, wt2, a["qb"][:, 0], a["qb"][:, 1],
                             forc_t, forc_p)
    forc_q_rh = ap.process_qbot(wt1, wt2, a["rh"], a["rh"], forc_t, forc_p,
                                is_rh=True)
    forc_lw = ap.process_flds(wt1, wt2, a["fl"][:, 0], a["fl"][:, 1],
                              forc_p, forc_q, forc_t)
    sol = ap.process_fsds(a["fs"], a["cosz"])
    rain, snow = ap.process_prec(a["pr"], forc_t)
    u, _ = ap.process_wind(wt1, wt2, a["wd"][:, 0], a["wd"][:, 1])
    out.update(forc_t=forc_t, forc_p=forc_p, forc_q=forc_q,
               forc_q_rh=forc_q_rh, forc_lw=forc_lw, solad=sol.forc_solad,
               solai=sol.forc_solai, rain=rain, snow=snow, wind_u=u,
               rho=ap.derive_forc_rho(forc_p, forc_q, forc_t),
               po2=ap.derive_forc_po2(forc_p),
               pco2=ap.derive_forc_pco2(forc_p))
    return out


def test_misc_modules_golden(fixture_dir):
    gref = GoldenFile(str(fixture_dir / "Misc_REF.txt"))
    cases = gref.steps

    def gather(name):
        arr = np.stack([np.atleast_1d(gref.state(t)[name]) for t in cases])
        if arr.shape[-1] == 1 and np.ndim(gref.state(cases[0])[name]) == 0:
            arr = arr.squeeze(-1)
        return jnp.asarray(arr)

    scalar = ["frac_sno_eff", "frac_h2osfc", "t_h2osfc_bef",
              "tssbef_snotop", "tssbef_soitop", "t_grnd", "cgrnds",
              "cgrndl", "eflx_sh_grnd", "qflx_evap_soi", "qflx_ev_snow",
              "qflx_ev_soil", "qflx_ev_h2osfc", "h2osoi_ice_snotop",
              "h2osoi_liq_snotop", "htvp", "sabg_soil", "sabg_snow",
              "dlrad", "frac_veg_nosno", "emg", "forc_lwrad",
              "eflx_sh_veg", "qflx_evap_veg", "qflx_snwcp_liq",
              "qflx_snwcp_ice", "ulrad", "h2ocan", "h2osno_c", "h2osfc_c",
              "latrad", "lonrad", "jday", "snow_depth0", "roota", "rootb",
              "wt1", "fs", "pr", "cosz", "rh"]
    arrays = ["ice", "liq", "sand", "clay", "organic", "zsoi", "zi_full",
              "tb", "pb", "qb", "fl", "wd"]
    a = {k: gather("in_" + k) for k in scalar + arrays}
    a["snl"] = jnp.asarray(np.array(
        [int(gref.state(t)["in_snl"]) for t in cases]))
    a["do_capsnow"] = jnp.asarray(np.array(
        [int(gref.state(t)["in_do_capsnow"]) for t in cases]))
    a["cse"] = jnp.asarray(np.arange(len(cases), dtype=np.float64))

    got = _chain(a)

    errors = []
    for name, val in got.items():
        want = np.stack([np.atleast_1d(gref.state(t)[name])
                         for t in cases])
        v = np.array(val, dtype=np.float64)
        if v.ndim == 1:
            v = v[:, None]
        compare(name, v, want, rtol=1e-11, atol=1e-12, errors=errors)
    assert not errors, "\n".join(errors[:25])
