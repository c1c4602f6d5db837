"""Canopy interception, throughfall, snow initiation, and surface-water
fraction — batched over columns.

TPU-native rebuild of the reference's per-column canopy-hydrology kernels
(``/root/reference/src/physics/canopy_hydrology_impl.hh:5-359``, themselves
derived from ELM's CanopyHydrologyMod.F90).  Data-dependent branches become
``jnp.where`` masks over the whole batch; the per-column top-snow-layer
scatter in ``snow_init`` becomes a one-hot masked update.

Index conventions follow ``INDEX_MAP_README.txt``: combined snow+soil layer
arrays have shape ``[ncol, NLEVSNO+NLEVGRND]`` with snow on top (layer 0 =
topmost possible snow layer, layer NLEVSNO = top soil layer); ``snl`` is the
*positive* number of active snow layers; the top active snow layer sits at
index ``NLEVSNO - snl``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.math_utils import safe_div, \
    safe_tanh


class InterceptionOut(NamedTuple):
    h2ocan: jnp.ndarray
    qflx_candrip: jnp.ndarray
    qflx_through_snow: jnp.ndarray
    qflx_through_rain: jnp.ndarray
    fracsnow: jnp.ndarray
    fracrain: jnp.ndarray


def interception(land: c.LandType, frac_veg_nosno, forc_rain, forc_snow,
                 dewmx, elai, esai, dtime, h2ocan) -> InterceptionOut:
    """Canopy interception/storage and throughfall.

    Reference: ``canopy_hydrology_impl.hh:8-67`` (``interception``).
    """
    zero = jnp.zeros_like(forc_rain)
    passthrough = InterceptionOut(h2ocan, zero, zero, zero, zero, zero)
    icecase = InterceptionOut(zero, zero, zero, zero, zero, zero)
    if land.lakpoi or land.is_wall:
        return passthrough

    ice = c.ltype_mask(land, c.ISTICE, c.ISTICE_MEC)
    soil_like = c.lor(c.ltype_mask(land, c.ISTSOIL, c.ISTWET, c.ISTCROP),
                      land.urbpoi)
    if ice is True:
        return icecase
    if ice is False and soil_like is False:
        return passthrough

    total = forc_rain + forc_snow
    active = (frac_veg_nosno == 1) & (total > 0.0)

    fracsnow = jnp.where(active, safe_div(forc_snow, total, total > 0.0), 0.0)
    fracrain = jnp.where(active, safe_div(forc_rain, total, total > 0.0), 0.0)

    h2ocanmx = dewmx * (elai + esai)
    fpi = 0.25 * (1.0 - jnp.exp(-0.5 * (elai + esai)))
    qflx_through_snow = jnp.where(active, forc_snow * (1.0 - fpi), 0.0)
    qflx_through_rain = jnp.where(active, forc_rain * (1.0 - fpi), 0.0)
    qflx_prec_intr = jnp.where(active, total * fpi, 0.0)

    h2ocan_new = jnp.where(
        active, jnp.maximum(0.0, h2ocan + dtime * qflx_prec_intr), h2ocan)
    # excess water beyond leaf capacity drips off
    xrun = (h2ocan_new - h2ocanmx) / dtime
    drip = active & (xrun > 0.0)
    qflx_candrip = jnp.where(drip, xrun, 0.0)
    h2ocan_new = jnp.where(drip, h2ocanmx, h2ocan_new)

    out = InterceptionOut(h2ocan_new, qflx_candrip, qflx_through_snow,
                          qflx_through_rain, fracsnow, fracrain)
    # per-column ltype: non-soil-like columns pass through, ice zeroes
    out = c.lsel(soil_like, out, passthrough)
    return c.lsel(ice, icecase, out)


class GroundFluxOut(NamedTuple):
    qflx_snwcp_liq: jnp.ndarray
    qflx_snwcp_ice: jnp.ndarray
    qflx_snow_grnd: jnp.ndarray
    qflx_rain_grnd: jnp.ndarray


def ground_flux(land: c.LandType, do_capsnow, frac_veg_nosno, forc_rain,
                forc_snow, qflx_irrig, qflx_candrip, qflx_through_snow,
                qflx_through_rain, fracsnow, fracrain) -> GroundFluxOut:
    """Precipitation (+irrigation) reaching the ground, split rain/snow.

    Reference: ``canopy_hydrology_impl.hh:82-120`` (``ground_flux``).
    """
    if land.is_wall:
        prec_snow = jnp.zeros_like(forc_snow)
        prec_rain = jnp.zeros_like(forc_rain)
    else:
        bare = frac_veg_nosno == 0
        prec_snow = jnp.where(bare, forc_snow,
                              qflx_through_snow + qflx_candrip * fracsnow)
        prec_rain = jnp.where(bare, forc_rain,
                              qflx_through_rain + qflx_candrip * fracrain)
    prec_rain = prec_rain + qflx_irrig

    cap = do_capsnow != 0
    return GroundFluxOut(
        qflx_snwcp_liq=jnp.where(cap, prec_rain, 0.0),
        qflx_snwcp_ice=jnp.where(cap, prec_snow, 0.0),
        qflx_snow_grnd=jnp.where(cap, 0.0, prec_snow),
        qflx_rain_grnd=jnp.where(cap, 0.0, prec_rain),
    )


class FractionWetOut(NamedTuple):
    fwet: jnp.ndarray
    fdry: jnp.ndarray


def fraction_wet(land: c.LandType, frac_veg_nosno, dewmx, elai, esai,
                 h2ocan) -> FractionWetOut:
    """Wetted and dry fractions of the canopy.

    Reference: ``canopy_hydrology_impl.hh:122-142`` (``fraction_wet``).
    """
    veg = frac_veg_nosno == 1
    vegt = frac_veg_nosno * (elai + esai)
    wet = veg & (h2ocan > 0.0)
    # the reference uses the truncated literal 0.666666666666, keep it
    fwet_raw = safe_div(h2ocan / dewmx, vegt, vegt > 0.0) ** 0.666666666666
    fwet = jnp.where(wet, jnp.minimum(fwet_raw, 1.0), 0.0)
    fdry = jnp.where(veg, (1.0 - fwet) * elai / (elai + esai), 0.0)
    return FractionWetOut(fwet, fdry)


class SnowInitOut(NamedTuple):
    snow_depth: jnp.ndarray
    h2osno: jnp.ndarray
    int_snow: jnp.ndarray
    swe_old: jnp.ndarray       # [ncol, NLEVSNO]
    h2osoi_liq: jnp.ndarray    # [ncol, NLEVTOT]
    h2osoi_ice: jnp.ndarray    # [ncol, NLEVTOT]
    t_soisno: jnp.ndarray      # [ncol, NLEVTOT]
    frac_iceold: jnp.ndarray   # [ncol, NLEVTOT]
    snl: jnp.ndarray
    dz: jnp.ndarray            # [ncol, NLEVTOT]
    z: jnp.ndarray             # [ncol, NLEVTOT]
    zi: jnp.ndarray            # [ncol, NLEVTOT+1]
    snw_rds: jnp.ndarray       # [ncol, NLEVSNO]
    frac_sno_eff: jnp.ndarray
    frac_sno: jnp.ndarray


def snow_init(land: c.LandType, dtime, do_capsnow, oldfflag, forc_t, t_grnd,
              qflx_snow_grnd, qflx_snow_melt, n_melt, snow_depth, h2osno,
              int_snow, h2osoi_liq, h2osoi_ice, t_soisno, frac_iceold, snl,
              dz, z, zi, snw_rds, frac_sno_eff, frac_sno) -> SnowInitOut:
    """Snow accumulation: depth/SWE update, snow-covered fraction, and
    creation/growth of the top snow layer.

    Reference: ``canopy_hydrology_impl.hh:144-308`` (``snow_init``).
    Snow density of new snow follows the Alta relationship (Anderson 1976);
    the fractional-snow-cover (FSCA) update follows the swe-change
    parameterization with the Niu & Yang 2007 option under ``oldfflag``.
    """
    accum_factor = 0.1
    nsno = c.NLEVSNO

    lev_sno = jnp.arange(nsno)                 # [NLEVSNO]
    lev_tot = jnp.arange(c.NLEVTOT)            # [NLEVTOT]
    snl_col = snl[:, None]

    # save initial snow water content per possible snow layer
    active_sno = lev_sno[None, :] >= (nsno - snl_col)
    swe_old = jnp.where(
        active_sno, h2osoi_liq[:, :nsno] + h2osoi_ice[:, :nsno], 0.0)

    cap = do_capsnow != 0
    newsnow = qflx_snow_grnd * dtime

    # --- non-capsnow branch -------------------------------------------------
    # new-snow bulk density (Alta relationship)
    bifall = jnp.where(
        forc_t > c.TFRZ + 2.0,
        50.0 + 1.7 * 17.0 ** 1.5,
        jnp.where(forc_t > c.TFRZ - 15.0,
                  50.0 + 1.7 * jnp.maximum(forc_t - c.TFRZ + 15.0, 0.0) ** 1.5,
                  50.0))
    int_snow_nc = jnp.maximum(int_snow, h2osno)
    snowmelt = qflx_snow_melt * dtime

    has_snow = h2osno > 0.0

    # FSCA change from melt during previous step
    smr = jnp.minimum(1.0, safe_div(h2osno, int_snow_nc, int_snow_nc > 0.0))
    frac_sno_melt = 1.0 - (jnp.arccos(jnp.minimum(1.0, 2.0 * smr - 1.0))
                           / c.ELM_PI) ** n_melt
    frac_sno_1 = jnp.where(has_snow & (snowmelt > 0.0), frac_sno_melt, frac_sno)

    # FSCA update from new snow event
    fsno_new = 1.0 - (1.0 - safe_tanh(accum_factor * newsnow)) \
        * (1.0 - frac_sno_1)
    frac_sno_2 = jnp.where(has_snow & (newsnow > 0.0), fsno_new, frac_sno_1)
    temp_intsnow = safe_div(
        h2osno + newsnow,
        0.5 * (jnp.cos(c.ELM_PI
                       * jnp.maximum(0.0, 1.0
                                     - jnp.maximum(frac_sno_2, 1.e-6))
                       ** (1.0 / n_melt)) + 1.0))
    int_snow_2 = jnp.where(has_snow & (newsnow > 0.0),
                           jnp.minimum(1.e8, temp_intsnow), int_snow_nc)

    # snow depth update (subgrid flux form vs uniform cover)
    if c.SUBGRIDFLAG == 1 and not land.urbpoi:
        depth_upd = jnp.where(
            frac_sno_2 > 0.0,
            snow_depth + safe_div(newsnow, bifall * frac_sno_2, frac_sno_2 > 0.0),
            0.0)
    else:
        depth_upd = snow_depth + newsnow / bifall
    snow_depth_1 = jnp.where(has_snow, depth_upd, snow_depth)

    # oldfflag==1: Niu & Yang 2007 snow cover fraction
    nyfrac = safe_tanh(
        safe_div(snow_depth_1,
                 2.5 * c.ZLND
                 * jnp.minimum(800.0, safe_div(h2osno + newsnow,
                                               snow_depth_1 * 100.0,
                                               snow_depth_1 > 0.0)),
                 snow_depth_1 > 0.0))
    use_ny = has_snow & (oldfflag == 1)
    frac_sno_3 = jnp.where(use_ny & (snow_depth_1 > 0.0), nyfrac, frac_sno_2)
    frac_sno_3 = jnp.where(use_ny & (h2osno < 1.0),
                           jnp.minimum(frac_sno_3, h2osno), frac_sno_3)

    # --- no pre-existing snow: initialize from new snowfall ---
    fresh = (~has_snow) & (newsnow > 0.0)
    z_avg = newsnow / bifall
    frac_fresh = safe_tanh(accum_factor * newsnow)
    temp_intsnow_f = safe_div(
        h2osno + newsnow,
        0.5 * (jnp.cos(c.ELM_PI
                       * jnp.maximum(0.0, 1.0
                                     - jnp.maximum(frac_fresh, 1.e-6))
                       ** (1.0 / n_melt)) + 1.0))
    int_snow_fresh = jnp.minimum(1.e8, temp_intsnow_f)
    if c.SUBGRIDFLAG == 1 and not land.urbpoi:
        depth_fresh = safe_div(z_avg, frac_fresh, frac_fresh > 0.0)
    else:
        depth_fresh = newsnow / bifall
    # oldfflag==1 N&Y07 on fresh snow
    nyfrac_fresh = safe_tanh(
        safe_div(depth_fresh,
                 2.5 * c.ZLND
                 * jnp.minimum(800.0, safe_div(h2osno + newsnow,
                                               depth_fresh * 100.0,
                                               depth_fresh > 0.0)),
                 depth_fresh > 0.0))
    frac_fresh = jnp.where((oldfflag == 1) & (depth_fresh > 0.0),
                           nyfrac_fresh, frac_fresh)

    none_ = (~has_snow) & (newsnow <= 0.0)
    frac_sno_nc = jnp.where(fresh, frac_fresh,
                            jnp.where(none_, 0.0, frac_sno_3))
    snow_depth_nc = jnp.where(fresh, depth_fresh,
                              jnp.where(none_, 0.0, snow_depth_1))
    int_snow_nc2 = jnp.where(fresh, int_snow_fresh, int_snow_2)

    h2osno_nc = h2osno + newsnow
    int_snow_nc3 = int_snow_nc2 + newsnow
    dz_snowf_nc = snow_depth_nc - snow_depth

    # --- merge capsnow / non-capsnow ---------------------------------------
    frac_sno_new = jnp.where(cap, 1.0, frac_sno_nc)
    int_snow_new = jnp.where(cap, 5.e2, int_snow_nc3)
    snow_depth_new = jnp.where(cap, snow_depth, snow_depth_nc)
    h2osno_new = jnp.where(cap, h2osno, h2osno_nc)
    dz_snowf = jnp.where(cap, 0.0, dz_snowf_nc)

    # effective snow fraction
    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    ones_f = jnp.ones_like(frac_sno_new)
    frac_sno_eff_new = c.lsel(
        sc, frac_sno_new if c.SUBGRIDFLAG == 1 else ones_f, ones_f)

    wet = c.ltype_mask(land, c.ISTWET)
    if wet is not False:
        warm = t_grnd > c.TFRZ
        h2osno_new = c.lsel(wet, jnp.where(warm, 0.0, h2osno_new),
                            h2osno_new)
        snow_depth_new = c.lsel(wet, jnp.where(warm, 0.0, snow_depth_new),
                                snow_depth_new)

    # --- initialize first snow layer when accumulation >= 10 mm -------------
    newnode = ((snl == 0) & (qflx_snow_grnd > 0.0)
               & (frac_sno_new * snow_depth_new >= 0.01))
    snl_new = jnp.where(newnode, 1, snl)

    bot = nsno - 1  # bottom (ground-adjacent) snow layer index
    onehot_bot = (lev_tot[None, :] == bot) & newnode[:, None]
    dz_new = jnp.where(onehot_bot, snow_depth_new[:, None], dz)
    z_new = jnp.where(onehot_bot, -0.5 * snow_depth_new[:, None], z)
    lev_zi = jnp.arange(c.NLEVTOT + 1)
    onehot_zi = (lev_zi[None, :] == bot) & newnode[:, None]
    zi_new = jnp.where(onehot_zi, -snow_depth_new[:, None], zi)
    t_new = jnp.where(onehot_bot,
                      jnp.minimum(c.TFRZ, forc_t)[:, None], t_soisno)
    ice_new = jnp.where(onehot_bot, h2osno_new[:, None], h2osoi_ice)
    liq_new = jnp.where(onehot_bot, 0.0, h2osoi_liq)
    frac_iceold_new = jnp.where(onehot_bot, 1.0, frac_iceold)
    onehot_bot_sno = (lev_sno[None, :] == bot) & newnode[:, None]
    snw_rds_new = jnp.where(onehot_bot_sno, c.SNW_RDS_MIN, snw_rds)

    # --- add new snowfall to existing top snow layer ------------------------
    grow = (snl_new > 0) & (~newnode)
    top_idx = nsno - snl_new  # index of top active snow layer
    onehot_top = (lev_tot[None, :] == top_idx[:, None]) & grow[:, None]
    ice_new = ice_new + jnp.where(onehot_top, newsnow[:, None], 0.0)
    dz_new = dz_new + jnp.where(onehot_top, dz_snowf[:, None], 0.0)

    return SnowInitOut(snow_depth_new, h2osno_new, int_snow_new, swe_old,
                       liq_new, ice_new, t_new, frac_iceold_new, snl_new,
                       dz_new, z_new, zi_new, snw_rds_new, frac_sno_eff_new,
                       frac_sno_new)


class FractionH2osfcOut(NamedTuple):
    h2osfc: jnp.ndarray
    h2osoi_liq: jnp.ndarray
    frac_sno: jnp.ndarray
    frac_sno_eff: jnp.ndarray
    frac_h2osfc: jnp.ndarray


def fraction_h2osfc(land: c.LandType, micro_sigma, h2osno, h2osfc,
                    h2osoi_liq, frac_sno, frac_sno_eff) -> FractionH2osfcOut:
    """Surface-water fraction from microtopographic variability.

    10-iteration Newton solve of the submerged-fraction relation (an erf of
    ponding depth over micro_sigma), then consistency adjustment against the
    snow fraction.  Reference: ``canopy_hydrology_impl.hh:310-357``.
    """
    min_h2osfc = 1.e-8
    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    passthrough = FractionH2osfcOut(h2osfc, h2osoi_liq, frac_sno,
                                    frac_sno_eff, jnp.zeros_like(h2osfc))
    if sc is False:
        return passthrough

    ponded = h2osfc > min_h2osfc
    sigma = 1.0e3 * micro_sigma  # convert to mm
    sigma_safe = jnp.where(sigma > 0.0, sigma, 1.0)
    sqrt2 = jnp.sqrt(2.0)

    def newton(_, d):  # fixed-count Newton iteration (erf-heavy body
        erf_term = jax_erf(d / (sigma_safe * sqrt2))  # compiles once)
        fd = (0.5 * d * (1.0 + erf_term)
              + sigma_safe / jnp.sqrt(2.0 * c.ELM_PI)
              * jnp.exp(-(d ** 2) / (2.0 * sigma_safe ** 2)) - h2osfc)
        dfdd = 0.5 * (1.0 + erf_term)
        return d - fd / jnp.where(dfdd != 0.0, dfdd, 1.0)

    import jax as _jax
    d = _jax.lax.fori_loop(0, 10, newton, jnp.zeros_like(h2osfc))
    frac_h2osfc = jnp.where(
        ponded, 0.5 * (1.0 + jax_erf(d / (sigma_safe * sqrt2))), 0.0)

    # unpondable water goes into the top soil layer
    lev = jnp.arange(h2osoi_liq.shape[-1])
    onehot_topsoil = (lev[None, :] == c.NLEVSNO) & (~ponded)[:, None]
    h2osoi_liq_new = h2osoi_liq + jnp.where(onehot_topsoil, h2osfc[:, None], 0.0)
    h2osfc_new = jnp.where(ponded, h2osfc, 0.0)

    # keep frac_sno + frac_h2osfc <= 1
    over = (frac_sno > (1.0 - frac_h2osfc)) & (h2osno > 0.0)
    big = over & (frac_h2osfc > 0.01)
    frac_h2osfc_adj = jnp.where(big, jnp.maximum(1.0 - frac_sno, 0.01),
                                frac_h2osfc)
    frac_sno_adj = jnp.where(over, 1.0 - frac_h2osfc_adj, frac_sno)
    frac_sno_eff_adj = jnp.where(over, frac_sno_adj, frac_sno_eff)

    return c.lsel(sc, FractionH2osfcOut(h2osfc_new, h2osoi_liq_new,
                                        frac_sno_adj, frac_sno_eff_adj,
                                        frac_h2osfc_adj), passthrough)


def jax_erf(x):
    from jax.scipy.special import erf
    return erf(x)
