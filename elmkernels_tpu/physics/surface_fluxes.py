"""Post-solve surface flux corrections and outgoing longwave — batched.

TPU-native rebuild of
``/root/reference/src/physics/surface_fluxes_impl.hh:4-296`` (from ELM's
SoilFluxesMod.F90).  The reference's literal arithmetic is preserved even
where it looks like a typo (``pow(t_h2osfc_bef, 40)`` at impl:176 and
``pow(emg*STEBOL*t_grnd0, 3.0)`` at impl:182) so results are
bit-comparable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c


def prev_tgrnd(snl, frac_sno_eff, frac_h2osfc, t_h2osfc_bef, tssbef_snotop,
               tssbef_soitop):
    """Reference: ``surface_fluxes_impl.hh:9-20``."""
    with_snow = (frac_sno_eff * tssbef_snotop
                 + (1.0 - frac_sno_eff - frac_h2osfc) * tssbef_soitop
                 + frac_h2osfc * t_h2osfc_bef)
    without = (1.0 - frac_h2osfc) * tssbef_soitop + frac_h2osfc * t_h2osfc_bef
    return jnp.where(snl > 0, with_snow, without)


class InitialFluxOut(NamedTuple):
    eflx_sh_grnd: jnp.ndarray
    qflx_evap_soi: jnp.ndarray
    qflx_ev_snow: jnp.ndarray
    qflx_ev_soil: jnp.ndarray
    qflx_ev_h2osfc: jnp.ndarray


def initial_flux_calc(land: c.LandType, snl, frac_sno_eff, frac_h2osfc,
                      t_h2osfc_bef, tssbef_snotop, tssbef_soitop, t_grnd,
                      cgrnds, cgrndl, eflx_sh_grnd, qflx_evap_soi,
                      qflx_ev_snow, qflx_ev_soil,
                      qflx_ev_h2osfc) -> InitialFluxOut:
    """tinc-correct fluxes for temperature change during the step.

    Reference: ``surface_fluxes_impl.hh:73-95`` (``initial_flux_calc``).
    """
    t_grnd0 = prev_tgrnd(snl, frac_sno_eff, frac_h2osfc, t_h2osfc_bef,
                         tssbef_snotop, tssbef_soitop)
    tinc = t_grnd - t_grnd0
    sh = eflx_sh_grnd + tinc * cgrnds
    ev = qflx_evap_soi + tinc * cgrndl
    if land.urbpoi:
        return InitialFluxOut(sh, ev, ev, jnp.zeros_like(ev),
                              jnp.zeros_like(ev))
    return InitialFluxOut(sh, ev, qflx_ev_snow + tinc * cgrndl,
                          qflx_ev_soil + tinc * cgrndl,
                          qflx_ev_h2osfc + tinc * cgrndl)


class UpdateFluxOut(NamedTuple):
    qflx_evap_soi: jnp.ndarray
    eflx_sh_grnd: jnp.ndarray
    qflx_ev_snow: jnp.ndarray
    qflx_ev_soil: jnp.ndarray
    qflx_ev_h2osfc: jnp.ndarray
    eflx_soil_grnd: jnp.ndarray
    eflx_sh_tot: jnp.ndarray
    qflx_evap_tot: jnp.ndarray
    eflx_lh_tot: jnp.ndarray
    qflx_evap_grnd: jnp.ndarray
    qflx_sub_snow: jnp.ndarray
    qflx_dew_snow: jnp.ndarray
    qflx_dew_grnd: jnp.ndarray
    qflx_snwcp_liq: jnp.ndarray
    qflx_snwcp_ice: jnp.ndarray


def update_surface_fluxes(land: c.LandType, do_capsnow, snl, dtime, t_grnd,
                          htvp, frac_sno_eff, frac_h2osfc, t_h2osfc_bef,
                          sabg_soil, sabg_snow, dlrad, frac_veg_nosno, emg,
                          forc_lwrad, tssbef_snotop, tssbef_soitop,
                          h2osoi_ice_snotop, h2osoi_liq_snotop, eflx_sh_veg,
                          qflx_evap_veg, qflx_evap_soi, eflx_sh_grnd,
                          qflx_ev_snow, qflx_ev_soil, qflx_ev_h2osfc,
                          qflx_snwcp_liq, qflx_snwcp_ice,
                          elm_correct_seb: bool = False) -> UpdateFluxOut:
    """Evaporation-limited flux update, ground heat flux, totals, and
    evaporation/sublimation/dew partitioning.

    Reference: ``surface_fluxes_impl.hh:146-230``
    (``update_surface_fluxes``); ``evap_ratio`` at lines 31-46.

    ``elm_correct_seb=True`` fixes the reference's dropped-linearization
    quirk at impl:182 — ``pow(emg*STEBOL*t_grnd0, 3.0)`` cubes the whole
    emitted-flux expression instead of just the temperature (ELM proper,
    SoilFluxesMod.F90, uses ``4*emg*STEBOL*t_grnd0**3*tinc`` as
    ``lwrad_outgoing`` here does), which leaves errseb ~ 4*emg*sigma*
    T0^3*tinc (tens to hundreds of W/m2 on steps with a ground
    temperature jump).  Default False = reference-exact.
    """
    egsmax = jnp.maximum(
        (h2osoi_ice_snotop + h2osoi_liq_snotop) / dtime, 0.0)
    ev_safe = jnp.where(qflx_evap_soi != 0.0, qflx_evap_soi, 1.0)
    egirat = jnp.where(qflx_evap_soi > egsmax, egsmax / ev_safe, 1.0)

    limited = egirat < 1.0
    save_ev = qflx_evap_soi
    qflx_evap_soi = jnp.where(limited, qflx_evap_soi * egirat,
                              qflx_evap_soi)
    eflx_sh_grnd = jnp.where(
        limited, eflx_sh_grnd + (save_ev - qflx_evap_soi) * htvp,
        eflx_sh_grnd)
    qflx_ev_snow = jnp.where(limited, qflx_ev_snow * egirat, qflx_ev_snow)
    qflx_ev_soil = jnp.where(limited, qflx_ev_soil * egirat, qflx_ev_soil)
    qflx_ev_h2osfc = jnp.where(limited, qflx_ev_h2osfc * egirat,
                               qflx_ev_h2osfc)

    # ground heat flux (reference's literal pow(x, 40) kept).  The
    # where-guard matters in f32: 274**40 ~ 3e97 overflows to inf there,
    # and 0 * inf = NaN poisoned eflx_soil_grnd/errsoi/errseb whenever
    # frac_h2osfc == 0 (i.e. always, in runs without surface water).
    # With frac_h2osfc == 0 the guarded term is exactly 0 in f64 too, so
    # bit-parity with the reference is preserved.
    h2osfc_lw = jnp.where(frac_h2osfc != 0.0,
                          frac_h2osfc * t_h2osfc_bef ** 40, 0.0)
    lw_grnd = (frac_sno_eff * tssbef_snotop ** 4.0
               + (1.0 - frac_sno_eff - frac_h2osfc) * tssbef_soitop ** 4.0
               + h2osfc_lw)
    t_grnd0 = prev_tgrnd(snl, frac_sno_eff, frac_h2osfc, t_h2osfc_bef,
                         tssbef_snotop, tssbef_soitop)
    tinc = t_grnd - t_grnd0
    if elm_correct_seb:
        dlw_lin = 4.0 * emg * c.STEBOL * t_grnd0 ** 3.0 * tinc
    else:  # reference-literal: cubes the whole expression (impl:182)
        dlw_lin = (emg * c.STEBOL * t_grnd0) ** 3.0 * (4.0 * tinc)
    eflx_soil_grnd = (
        (1.0 - frac_sno_eff) * sabg_soil + frac_sno_eff * sabg_snow + dlrad
        + (1.0 - frac_veg_nosno) * emg * forc_lwrad
        - emg * c.STEBOL * lw_grnd
        - dlw_lin
        - (eflx_sh_grnd + qflx_evap_soi * htvp))

    eflx_sh_tot = eflx_sh_veg + eflx_sh_grnd
    qflx_evap_tot = qflx_evap_veg + qflx_evap_soi
    eflx_lh_tot = c.HVAP * qflx_evap_veg + htvp * qflx_evap_soi

    tot_top = h2osoi_liq_snotop + h2osoi_ice_snotop
    tot_safe = jnp.where(tot_top > 0.0, tot_top, 1.0)
    evap = qflx_ev_snow >= 0.0
    qflx_evap_grnd = jnp.where(
        evap & (tot_top > 0.0),
        jnp.maximum(qflx_ev_snow * (h2osoi_liq_snotop / tot_safe), 0.0), 0.0)
    qflx_sub_snow = jnp.where(evap, qflx_ev_snow - qflx_evap_grnd, 0.0)
    qflx_dew_snow = jnp.where(~evap & (t_grnd < c.TFRZ),
                              jnp.abs(qflx_ev_snow), 0.0)
    qflx_dew_grnd = jnp.where(~evap & (t_grnd >= c.TFRZ),
                              jnp.abs(qflx_ev_snow), 0.0)

    cap = (snl > 0) & (do_capsnow != 0)
    qflx_snwcp_liq = jnp.where(
        cap, qflx_snwcp_liq + frac_sno_eff * qflx_dew_grnd, qflx_snwcp_liq)
    qflx_snwcp_ice = jnp.where(
        cap, qflx_snwcp_ice + frac_sno_eff * qflx_dew_snow, qflx_snwcp_ice)

    return UpdateFluxOut(qflx_evap_soi, eflx_sh_grnd, qflx_ev_snow,
                         qflx_ev_soil, qflx_ev_h2osfc, eflx_soil_grnd,
                         eflx_sh_tot, qflx_evap_tot, eflx_lh_tot,
                         qflx_evap_grnd, qflx_sub_snow, qflx_dew_snow,
                         qflx_dew_grnd, qflx_snwcp_liq, qflx_snwcp_ice)


class LwradOut(NamedTuple):
    eflx_lwrad_out: jnp.ndarray
    eflx_lwrad_net: jnp.ndarray


def lwrad_outgoing(land: c.LandType, snl, frac_veg_nosno, forc_lwrad,
                   frac_sno_eff, tssbef_snotop, tssbef_soitop, frac_h2osfc,
                   t_h2osfc_bef, t_grnd, ulrad, emg) -> LwradOut:
    """Outgoing/net longwave above the canopy.

    Reference: ``surface_fluxes_impl.hh:239-259`` (``lwrad_outgoing``).
    """
    lw_grnd = (frac_sno_eff * tssbef_snotop ** 4.0
               + (1.0 - frac_sno_eff - frac_h2osfc) * tssbef_soitop ** 4.0
               + frac_h2osfc * t_h2osfc_bef ** 4.0)
    t_grnd0 = prev_tgrnd(snl, frac_sno_eff, frac_h2osfc, t_h2osfc_bef,
                         tssbef_snotop, tssbef_soitop)
    tinc = t_grnd - t_grnd0
    out = (ulrad + (1 - frac_veg_nosno) * (1.0 - emg) * forc_lwrad
           + (1 - frac_veg_nosno) * emg * c.STEBOL * lw_grnd
           + 4.0 * emg * c.STEBOL * t_grnd0 ** 3.0 * tinc)
    return LwradOut(out, out - forc_lwrad)


def soil_energy_balance(land: c.LandType, snl, eflx_soil_grnd, xmf,
                        xmf_h2osfc, frac_h2osfc, t_h2osfc, t_h2osfc_bef,
                        dtime, eflx_h2osfc_to_snow, frac_sno_eff, t_soisno,
                        tssbef, fact):
    """Soil energy balance residual (diagnostic).

    Reference: ``surface_fluxes_impl.hh:262-294`` (``soil_energy_balance``).
    """
    errsoi = (eflx_soil_grnd - xmf - xmf_h2osfc
              - frac_h2osfc * (t_h2osfc - t_h2osfc_bef) * (t_h2osfc / dtime)
              + eflx_h2osfc_to_snow)
    lev = jnp.arange(c.NLEVTOT)[None, :]
    top = (c.NLEVSNO - snl)[:, None]
    fact_safe = jnp.where(fact != 0.0, fact, 1.0)
    dheat = (t_soisno - tssbef) / fact_safe
    snow_rows = (lev >= top) & (lev < c.NLEVSNO)
    soil_rows = lev >= c.NLEVSNO
    errsoi = errsoi - jnp.sum(
        jnp.where(snow_rows, frac_sno_eff[:, None] * dheat, 0.0)
        + jnp.where(soil_rows, dheat, 0.0), axis=1)
    return errsoi
