"""Golden test for the soil-temperature chain (thermal properties, CN
penta solve, phase change) vs the reference kernels.

Fixture: tests/data/SoilTemperature_REF.txt — 60 synthetic columns covering
snl = 0..5, thin snow, standing water, and melt/freeze regimes; inputs are
embedded in the fixture (in_* variables).

Convention note: this implementation uses identity rows (diag 1, rhs 0)
above the top active layer of the banded system, whereas the reference
leaves zeros (and garbage in the solver scratch); comparisons of the
LHS/RHS/solution therefore mask rows above the top active layer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import soil_temperature as st
from elmkernels_tpu.physics import soil_thermal as sth
from elmkernels_tpu.utils.golden import GoldenFile, compare

LAND = c.LandType(ltype=1, ctype=1, vtype=12)
DTIME = 1800.0


@jax.jit
def _chain(a):
    snl = a["snl"]
    props = sth.thermal_properties(
        LAND, snl, a["frac_sno"], a["frac_h2osfc"], a["h2osno"], a["h2osfc"],
        a["h2osoi_liq"], a["h2osoi_ice"], a["t_soisno"], a["dz"], a["zsoi"],
        a["zisoi"], a["watsat"], a["tkmg"], a["tkdry"], a["csol"])

    snotop = (c.NLEVSNO - snl)[:, None]
    sabg_top = jnp.take_along_axis(a["sabg_lyr"], snotop, axis=1)[:, 0]
    t_top_sno = jnp.take_along_axis(a["t_soisno"], snotop, axis=1)[:, 0]
    sabg_chk = st.check_absorbed_solar(a["frac_sno_eff"], a["sabg_snow"],
                                       a["sabg_soil"])
    hs_soil = st.calc_surface_heat_flux(
        a["frac_veg_nosno"], a["dlrad"], a["emg"], a["forc_lwrad"],
        a["htvp"], a["sabg_soil"], a["t_soisno"][:, c.NLEVSNO],
        a["eflx_sh_soil"], a["qflx_ev_soil"])
    hs_h2osfc = st.calc_surface_heat_flux(
        a["frac_veg_nosno"], a["dlrad"], a["emg"], a["forc_lwrad"],
        a["htvp"], a["sabg_soil"], a["t_h2osfc"], a["eflx_sh_h2osfc"],
        a["qflx_ev_h2osfc"])
    hs_top_snow = st.calc_surface_heat_flux(
        a["frac_veg_nosno"], a["dlrad"], a["emg"], a["forc_lwrad"],
        a["htvp"], sabg_top, t_top_sno, a["eflx_sh_snow"],
        a["qflx_ev_snow"])
    dhsdT = st.calc_dhsdT(a["cgrnd"], a["emg"], a["t_grnd"])

    fn = st.calc_diffusive_heat_flux(snl, props.tk, a["t_soisno"], a["zsoi"])
    fact = st.calc_heat_flux_matrix_factor(snl, DTIME, props.cv, a["dz"],
                                           a["zsoi"], a["zisoi"])

    lhs, rhs = st._assemble_system(
        snl, DTIME, dhsdT, a["frac_sno_eff"], a["frac_h2osfc"],
        props.dz_h2osfc, props.c_h2osfc, props.tk_h2osfc, a["zsoi"], fact,
        props.tk, hs_top_snow, hs_soil, hs_h2osfc, a["t_soisno"],
        a["t_h2osfc"], fn, a["sabg_lyr"])
    tvec = st.pdma_solve(lhs, rhs)
    upd = st.update_temperature(snl, a["frac_h2osfc"], tvec, a["t_soisno"])

    pc1 = st.phase_change_h2osfc(
        snl, DTIME, a["frac_sno"], a["frac_h2osfc"], dhsdT, props.c_h2osfc,
        fact[:, c.NLEVSNO - 1], upd.t_h2osfc, a["h2osfc"], a["h2osno"],
        a["int_snow"], a["snow_depth"],
        upd.t_soisno[:, c.NLEVSNO - 1] * 0.0
        + a["h2osoi_ice"][:, c.NLEVSNO - 1],
        upd.t_soisno[:, c.NLEVSNO - 1])
    # scatter the mutated bottom-snow-layer values back
    ice = a["h2osoi_ice"].at[:, c.NLEVSNO - 1].set(pc1.h2osoi_ice_sl1)
    t_after = upd.t_soisno.at[:, c.NLEVSNO - 1].set(pc1.t_soisno_sl1)

    pc2 = st.phase_change_soisno(
        LAND, snl, DTIME, dhsdT, a["frac_h2osfc"], a["frac_sno_eff"], fact,
        a["watsat"], a["sucsat"], a["bsw"], a["dz"], pc1.h2osno,
        pc1.snow_depth, ice, a["h2osoi_liq"], t_after)

    t_grnd = st.update_t_grnd(snl, a["frac_h2osfc"], a["frac_sno_eff"],
                              pc1.t_h2osfc, pc2.t_soisno)

    return {
        "thk": props.thk, "tk": props.tk, "cv": props.cv,
        "tk_h2osfc": props.tk_h2osfc, "c_h2osfc": props.c_h2osfc,
        "dz_h2osfc": props.dz_h2osfc,
        "sabg_chk": sabg_chk, "hs_soil": hs_soil, "hs_h2osfc": hs_h2osfc,
        "hs_top_snow": hs_top_snow, "dhsdT": dhsdT, "fn": fn, "fact": fact,
        "lhs_matrix": lhs, "rhs_presolve": rhs, "tvector": tvec,
        "t_soisno_postsolve": upd.t_soisno,
        "t_h2osfc_postsolve": upd.t_h2osfc,
        "t_soisno": pc2.t_soisno, "t_h2osfc": pc1.t_h2osfc,
        "t_grnd": t_grnd, "h2osfc": pc1.h2osfc, "h2osno": pc2.h2osno,
        "int_snow": pc1.int_snow, "snow_depth": pc2.snow_depth,
        "xmf_h2osfc": pc1.xmf_h2osfc,
        "qflx_h2osfc_to_ice": pc1.qflx_h2osfc_to_ice,
        "eflx_h2osfc_to_snow": pc1.eflx_h2osfc_to_snow,
        "xmf": pc2.xmf, "qflx_snofrz": pc2.qflx_snofrz,
        "qflx_snow_melt": pc2.qflx_snow_melt,
        "qflx_snomelt": pc2.qflx_snomelt, "eflx_snomelt": pc2.eflx_snomelt,
        "imelt": pc2.imelt, "qflx_snofrz_lyr": pc2.qflx_snofrz_lyr,
        "h2osoi_ice": pc2.h2osoi_ice, "h2osoi_liq": pc2.h2osoi_liq,
    }


def test_soil_temperature_golden(fixture_dir):
    gref = GoldenFile(str(fixture_dir / "SoilTemperature_REF.txt"))
    cases = gref.steps
    n = len(cases)

    # batch all 60 cases into one call
    def gather(name, dtype=np.float64):
        return jnp.asarray(
            np.stack([np.atleast_1d(gref.state(t)[name]) for t in cases])
            .squeeze(-1) if np.ndim(gref.state(cases[0])[name]) == 0
            else np.stack([gref.state(t)[name] for t in cases]))

    a = {}
    scalar_keys = ["dlrad", "emg", "forc_lwrad", "htvp", "cgrnd",
                   "eflx_sh_soil", "eflx_sh_snow", "eflx_sh_h2osfc",
                   "qflx_ev_soil", "qflx_ev_snow", "qflx_ev_h2osfc",
                   "frac_sno_eff", "frac_sno", "frac_h2osfc", "sabg_snow",
                   "sabg_soil", "h2osfc", "h2osno", "snow_depth",
                   "int_snow", "t_h2osfc", "t_grnd"]
    array_keys = ["sabg_lyr", "watsat", "sucsat", "bsw", "tkmg", "tkdry",
                  "csol", "dz", "zsoi", "zisoi", "h2osoi_liq", "h2osoi_ice",
                  "t_soisno"]
    for k in scalar_keys + array_keys:
        a[k] = gather("in_" + k)
    a["snl"] = jnp.asarray(
        np.array([int(gref.state(t)["in_snl"]) for t in cases]))
    a["frac_veg_nosno"] = jnp.asarray(
        np.array([float(gref.state(t)["in_frac_veg_nosno"])
                  for t in cases]))

    got = _chain(a)

    top = c.NLEVSNO - np.asarray(a["snl"])  # per-case top active layer
    errors = []
    for name, val in got.items():
        want = np.stack([np.atleast_1d(gref.state(t)[name])
                         for t in cases])
        v = np.array(val)
        if v.ndim == 1:
            v = v[:, None]
        if name == "lhs_matrix":
            want = want.reshape(n, st.NSYS, c.NBAND)
            # reference leaves inactive rows zero; ours are identity rows
            for i in range(n):
                v[i, :top[i], :] = 0.0
        elif name in ("rhs_presolve", "tvector"):
            # inactive rows: reference zero (rhs) / solver garbage (tvector)
            for i in range(n):
                v[i, :top[i]] = 0.0
                want[i, :top[i]] = 0.0
        compare(name, v, want, rtol=1e-12, atol=1e-9, errors=errors)
    assert not errors, "\n".join(errors[:30])
