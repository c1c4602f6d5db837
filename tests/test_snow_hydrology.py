"""Golden test for the snow-hydrology chain (percolation, aerosols,
compaction, combine/divide layers, aging) vs the reference kernels.

Fixture: tests/data/SnowHydrology_REF.txt — 96 synthetic columns covering
layer elimination, pack dissolution, combination, subdivision, capsnow,
and percolation regimes.  The snow-aging lookup tables are the synthetic
ones from the generator (same closed-form fill).
"""

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import snow_hydrology as sh
from elmkernels_tpu.utils.golden import GoldenFile, compare

LAND = c.LandType(ltype=1, ctype=1, vtype=12)
DTIME = 1800.0

SPECIES = ["bcphi", "bcpho", "dst1", "dst2", "dst3", "dst4"]


def synth_tables():
    i = np.arange(11)[:, None, None]
    j = np.arange(31)[None, :, None]
    k = np.arange(8)[None, None, :]
    tau = 100.0 + 3.0 * i + 1.5 * j + 7.0 * k
    kappa = 1.0 + 0.05 * i + 0.01 * j + 0.02 * k
    drdt0 = 1.0 + 0.1 * i + 0.02 * j + 0.05 * k
    return (jnp.asarray(tau + 0.0 * j), jnp.asarray(kappa + 0.0 * j),
            jnp.asarray(drdt0 + 0.0 * j))


@jax.jit
def _chain(a, tau, kappa, drdt0):
    snl = a["snl"]
    mss = {k: a["mss_" + k] for k in SPECIES}

    sw = sh.snow_water(
        LAND, a["do_capsnow"], snl, DTIME, a["frac_sno_eff"], a["h2osno"],
        a["qflx_sub_snow"], a["qflx_evap_grnd"], a["qflx_dew_snow"],
        a["qflx_dew_grnd"], a["qflx_rain_grnd"], a["qflx_snomelt"],
        a["qflx_snow_melt"], a["int_snow"], a["frac_sno"], a["h2osoi_liq"],
        a["h2osoi_ice"], mss, a["dz"])

    aero_in = {"bcphi": a["aero"][:, 0], "bcpho": a["aero"][:, 1],
               "bcdep": a["aero"][:, 2],
               "dst1_1": a["aero"][:, 3], "dst1_2": a["aero"][:, 4],
               "dst2_1": a["aero"][:, 5], "dst2_2": a["aero"][:, 6],
               "dst3_1": a["aero"][:, 7], "dst3_2": a["aero"][:, 8],
               "dst4_1": a["aero"][:, 9], "dst4_2": a["aero"][:, 10]}
    mss = sh.compute_aerosol_deposition(DTIME, snl, aero_in, sw.mss)

    bcphi, bcpho = sh.aerosol_phase_change(
        snl, DTIME, a["qflx_sub_snow"], sw.h2osoi_liq, sw.h2osoi_ice,
        mss["bcphi"], mss["bcpho"])
    mss = dict(mss, bcphi=bcphi, bcpho=bcpho)

    qflx_rootsoi = sh.transpiration(a["veg_active"] != 0,
                                    a["qflx_tran_veg"], a["rootr"])

    dz = sh.snow_compaction(LAND, snl, DTIME, sw.int_snow, a["n_melt"],
                            sw.frac_sno, a["imelt"], a["swe_old"],
                            sw.h2osoi_liq, sw.h2osoi_ice, a["t_soisno"],
                            a["frac_iceold"], sw.dz)

    st = sh.SnowState(snl, a["t_soisno"], sw.h2osoi_ice, sw.h2osoi_liq,
                      a["snw_rds"], mss, dz, a["z"], a["zi"])
    cb = sh.combine_layers(LAND, DTIME, st, a["h2osno"], a["snow_depth"],
                           a["frac_sno_eff"], sw.frac_sno, sw.int_snow)
    st = sh.divide_layers(cb.frac_sno, cb.state)
    st = sh.prune_snow_layers(st)

    mss2, cnc = sh.update_aerosol_mass_and_concen(
        DTIME, st.snl, a["do_capsnow"], a["qflx_snwcp_ice"], st.ice, st.liq,
        st.mss)

    snw_rds = sh.snow_aging(
        a["do_capsnow"], st.snl, cb.frac_sno, DTIME, a["qflx_snwcp_ice"],
        a["qflx_snow_grnd"], cb.h2osno, st.dz, st.liq, st.ice, st.t,
        a["qflx_snofrz_lyr"], tau, kappa, drdt0, st.rds)

    out = {
        "snl": st.snl, "h2osno": cb.h2osno, "snow_depth": cb.snow_depth,
        "frac_sno": cb.frac_sno, "frac_sno_eff": cb.frac_sno_eff,
        "int_snow": cb.int_snow, "qflx_snow_melt": sw.qflx_snow_melt,
        "qflx_top_soil": sw.qflx_top_soil,
        "mflx_neg_snow": sw.mflx_neg_snow,
        "qflx_sl_top_soil": cb.qflx_sl_top_soil,
        "qflx_snow2topsoi": cb.qflx_snow2topsoi,
        "mflx_snowlyr_col": cb.mflx_snowlyr_col,
        "h2osoi_liq": st.liq, "h2osoi_ice": st.ice, "t_soisno": st.t,
        "dz": st.dz, "z": st.z, "zi": st.zi, "snw_rds": snw_rds,
        "qflx_rootsoi": qflx_rootsoi,
    }
    for k in SPECIES:
        out["mss_" + k] = mss2[k]
        out["cnc_" + k] = cnc[k]
    return out


def test_snow_hydrology_golden(fixture_dir):
    gref = GoldenFile(str(fixture_dir / "SnowHydrology_REF.txt"))
    cases = gref.steps

    def gather(name):
        vals = [np.atleast_1d(gref.state(t)[name]) for t in cases]
        arr = np.stack(vals)
        return jnp.asarray(arr.squeeze(-1) if arr.shape[-1] == 1
                           and np.ndim(gref.state(cases[0])[name]) == 0
                           else arr)

    scalar = ["frac_sno_eff", "frac_sno", "h2osno", "snow_depth",
              "int_snow", "n_melt", "qflx_sub_snow", "qflx_evap_grnd",
              "qflx_dew_snow", "qflx_dew_grnd", "qflx_rain_grnd",
              "qflx_snomelt", "qflx_snow_melt", "qflx_snwcp_ice",
              "qflx_snow_grnd", "qflx_tran_veg"]
    arrays = ["h2osoi_liq", "h2osoi_ice", "t_soisno", "dz", "z", "zi",
              "snw_rds", "swe_old", "frac_iceold", "qflx_snofrz_lyr",
              "rootr", "aero"] + ["mss_" + k for k in SPECIES]
    a = {k: gather("in_" + k) for k in scalar + arrays}
    for k in ("snl", "do_capsnow", "veg_active"):
        a[k] = jnp.asarray(np.array(
            [int(gref.state(t)["in_" + k]) for t in cases]))
    a["imelt"] = jnp.asarray(np.stack(
        [gref.state(t)["in_imelt"] for t in cases]).astype(np.int32))

    got = _chain(a, *synth_tables())

    errors = []
    for name, val in got.items():
        want = np.stack([np.atleast_1d(gref.state(t)[name])
                         for t in cases])
        v = np.array(val, dtype=np.float64)
        if v.ndim == 1:
            v = v[:, None]
        compare(name, v, want, rtol=1e-11, atol=1e-13, errors=errors)
    assert not errors, "\n".join(errors[:25])
