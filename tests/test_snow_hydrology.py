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


def test_snow_aging_pinned_equivalence():
    """The driver's fast path (snow_aging_pinned) must reproduce the full
    reference-exact snow_aging bit-for-bit: under the reference's
    double-clamp quirk (snow_hydrology_impl.hh:216-222) every active
    layer pins to SNW_RDS_MIN, so the table pipeline is dead."""
    rng = np.random.default_rng(42)
    n = 256
    nsno = c.NLEVSNO
    snl = jnp.asarray(rng.integers(0, nsno + 1, size=n), dtype=jnp.int32)
    lev = np.arange(nsno)[None, :]
    active = lev >= (nsno - np.asarray(snl))[:, None]
    ice = jnp.asarray(np.where(active, rng.uniform(5.0, 100.0, (n, nsno)),
                               0.0))
    liq = jnp.asarray(np.where(active, rng.uniform(0.0, 5.0, (n, nsno)),
                               0.0))
    dz5 = jnp.asarray(np.where(active, rng.uniform(0.01, 0.3, (n, nsno)),
                               0.0))
    t5 = jnp.asarray(np.where(active, rng.uniform(240.0, 273.0, (n, nsno)),
                              0.0))
    # combined [ncol, NLEVTOT] arrays as the driver passes them
    pad = jnp.asarray(rng.uniform(0.1, 1.0, (n, c.NLEVGRND)))
    tpad = jnp.asarray(rng.uniform(260.0, 280.0, (n, c.NLEVGRND)))
    liq_c = jnp.concatenate([liq, pad], axis=1)
    ice_c = jnp.concatenate([ice, pad], axis=1)
    t_c = jnp.concatenate([t5, tpad], axis=1)
    dz_c = jnp.concatenate([dz5, pad], axis=1)
    # snw_rds: >= MIN in active layers (invariant from prior steps),
    # 0 inactive in layered columns, stale values in layerless columns
    rds = np.where(active, rng.uniform(c.SNW_RDS_MIN, 1000.0, (n, nsno)),
                   0.0)
    nolyr = np.asarray(snl) == 0
    rds[nolyr] = rng.uniform(0.0, 1000.0, (nolyr.sum(), nsno))
    rds = jnp.asarray(rds)
    h2osno = jnp.asarray(np.where(nolyr, rng.uniform(0.0, 1.0, n),
                                  np.asarray((ice + liq).sum(1))))
    frac_sno = jnp.asarray(rng.uniform(0.0, 1.0, n))
    do_capsnow = jnp.asarray(rng.integers(0, 2, n), dtype=jnp.int32)
    qflx_snwcp_ice = jnp.asarray(rng.uniform(0.0, 1e-4, n))
    qflx_snow_grnd = jnp.asarray(rng.uniform(0.0, 1e-4, n))
    qflx_snofrz_lyr = jnp.asarray(
        np.where(active, rng.uniform(0.0, 1e-5, (n, nsno)), 0.0))
    tau, kappa, drdt0 = synth_tables()

    full = sh.snow_aging(do_capsnow, snl, frac_sno, DTIME, qflx_snwcp_ice,
                         qflx_snow_grnd, h2osno, dz_c, liq_c, ice_c, t_c,
                         qflx_snofrz_lyr, tau, kappa, drdt0, rds)
    fast = sh.snow_aging_pinned(snl, h2osno, rds)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(fast))


def test_snow_aging_elm_correct_clamp_evolves():
    """With elm_correct_clamp=True (ELM-proper [MIN, MAX] bounds) grain
    radius actually grows; the reference-exact default pins it at
    SNW_RDS_MIN."""
    n, nsno = 4, c.NLEVSNO
    snl = jnp.full((n,), 3, dtype=jnp.int32)
    lev = np.arange(nsno)[None, :]
    active = lev >= (nsno - 3)
    ice = jnp.asarray(np.where(active, 50.0, 0.0) * np.ones((n, 1)))
    liq = jnp.asarray(np.where(active, 2.0, 0.0) * np.ones((n, 1)))
    dz5 = jnp.asarray(np.where(active, 0.1, 0.0) * np.ones((n, 1)))
    t5 = jnp.asarray(np.where(active, 265.0, 0.0) * np.ones((n, 1)))
    pad = jnp.full((n, c.NLEVGRND), 0.5)
    args = dict(
        do_capsnow=jnp.zeros(n, dtype=jnp.int32), snl=snl,
        frac_sno=jnp.full((n,), 0.9), dtime=DTIME,
        qflx_snwcp_ice=jnp.zeros(n), qflx_snow_grnd=jnp.zeros(n),
        h2osno=jnp.asarray(np.asarray(ice + liq).sum(1)),
        dz=jnp.concatenate([dz5, pad], axis=1),
        h2osoi_liq=jnp.concatenate([liq, pad], axis=1),
        h2osoi_ice=jnp.concatenate([ice, pad], axis=1),
        t_soisno=jnp.concatenate([t5, jnp.full((n, c.NLEVGRND), 270.0)],
                                 axis=1),
        qflx_snofrz_lyr=jnp.zeros((n, nsno)),
        snw_rds=jnp.asarray(np.where(active, 200.0, 0.0)
                            * np.ones((n, 1))))
    tau, kappa, drdt0 = synth_tables()

    ref = sh.snow_aging(**args, snowage_tau=tau, snowage_kappa=kappa,
                        snowage_drdt0=drdt0)
    fixed = sh.snow_aging(**args, snowage_tau=tau, snowage_kappa=kappa,
                          snowage_drdt0=drdt0, elm_correct_clamp=True)
    act = np.asarray(active & np.ones((n, 1), dtype=bool))
    assert np.all(np.asarray(ref)[act] == c.SNW_RDS_MIN)
    # started at 200 um; dr > 0 from the tables, so radius must grow
    assert np.all(np.asarray(fixed)[act] > 200.0)
    assert np.all(np.asarray(fixed)[act] <= c.SNW_RDS_MAX)


def test_snow_water_zeroes_negative_top_liquid():
    """A large lagged ground-evaporation debit on a thin melting pack
    drives the top snow layer's liquid negative; the reference zeroes
    it sequentially from the top and exports the deficit as
    mflx_neg_snow (snow_hydrology_impl.hh:317-324).  The r2 scan
    conversion killed the walk for any snl < NLEVSNO (the running flag
    died above the top layer), leaving negative liquid in the pack and
    a ~0.9 mm water-ledger leak at layer events (found by the r4 global
    winter run)."""
    import jax.numpy as jnp
    ncol, snl_n = 2, 3
    top = c.NLEVSNO - snl_n
    liq = jnp.zeros((ncol, c.NLEVTOT)).at[:, top].set(0.05)
    ice = jnp.zeros((ncol, c.NLEVTOT)).at[:, top:c.NLEVSNO].set(2.0)
    ice = ice.at[:, c.NLEVSNO:].set(1.0)
    dz = jnp.full((ncol, c.NLEVTOT), 0.02)
    mss = {k: jnp.zeros((ncol, c.NLEVSNO)) for k in
           ("bcphi", "bcpho", "dst1", "dst2", "dst3", "dst4")}
    z1 = jnp.zeros(ncol)
    sw = sh.snow_water(
        c.LandType(ltype=1, ctype=1, vtype=12),
        jnp.zeros(ncol, jnp.int32), jnp.full(ncol, snl_n), 1800.0,
        jnp.ones(ncol),               # frac_sno_eff
        jnp.full(ncol, 7.0),          # h2osno
        z1,                           # qflx_sub_snow
        jnp.full(ncol, 4.2e-4),       # qflx_evap_grnd (lagged, large)
        z1, z1, z1,                   # dew_snow, dew_grnd, rain_grnd
        z1, z1,                       # snomelt, snow_melt
        jnp.full(ncol, 8.0), jnp.ones(ncol), liq, ice, mss, dz)
    out5 = np.asarray(sw.h2osoi_liq)[:, :c.NLEVSNO]
    assert np.all(out5 >= 0.0), out5
    # deficit = debit (0.756) - available (0.05), exported as a flux
    want = -(4.2e-4 * 1800.0 - 0.05) / 1800.0
    np.testing.assert_allclose(np.asarray(sw.mflx_neg_snow), want,
                               rtol=1e-12)
