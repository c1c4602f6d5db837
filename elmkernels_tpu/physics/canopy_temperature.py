"""Ground temperature/humidity, emissivities, roughness lengths, and
forcing heights — batched over columns.

TPU-native rebuild of the reference's canopy-temperature kernels
(``/root/reference/src/physics/canopy_temperature_impl.hh:5-329``, derived
from ELM's CanopyTemperatureMod.F90).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import surface_resistance
from elmkernels_tpu.physics.qsat import qsat
from elmkernels_tpu.physics.math_utils import take_layer


class OldGroundTempOut(NamedTuple):
    t_h2osfc_bef: jnp.ndarray
    tssbef: jnp.ndarray  # [ncol, NLEVTOT]


def old_ground_temp(land: c.LandType, t_h2osfc, t_soisno) -> OldGroundTempOut:
    """Record pre-update ground/surface-water temperatures.

    Reference: ``canopy_temperature_impl.hh:7-28`` (``old_ground_temp``).
    """
    if land.ctype in (c.ICOL_SUNWALL, c.ICOL_SHADEWALL, c.ICOL_ROOF):
        lev = jnp.arange(c.NLEVTOT)
        tssbef = jnp.where(lev[None, :] > c.NLEVURB, c.SPVAL, t_soisno)
    else:
        tssbef = t_soisno
    return OldGroundTempOut(t_h2osfc, tssbef)


def ground_temp(land: c.LandType, snl, frac_sno_eff, frac_h2osfc, t_h2osfc,
                t_soisno) -> jnp.ndarray:
    """Ground temperature as snow/soil/surface-water weighted average.

    Reference: ``canopy_temperature_impl.hh:30-47`` (``ground_temp``).
    """
    ncol = t_soisno.shape[0]
    top_sno_t = take_layer(t_soisno, c.NLEVSNO - snl)
    top_soil_t = t_soisno[:, c.NLEVSNO]
    with_snow = (frac_sno_eff * top_sno_t
                 + (1.0 - frac_sno_eff - frac_h2osfc) * top_soil_t
                 + frac_h2osfc * t_h2osfc)
    without = (1.0 - frac_h2osfc) * top_soil_t + frac_h2osfc * t_h2osfc
    return jnp.where(snl > 0, with_snow, without)


class SoilAlphaOut(NamedTuple):
    qred: jnp.ndarray
    hr: jnp.ndarray
    soilalpha: jnp.ndarray


def calc_soilalpha(land: c.LandType, frac_sno, frac_h2osfc, h2osoi_liq,
                   h2osoi_ice, dz, t_soisno, watsat, sucsat,
                   bsw) -> SoilAlphaOut:
    """Soil-surface relative-humidity reduction factor.

    Reference: ``canopy_temperature_impl.hh:49-129`` (``calc_soilalpha``);
    urban/pervious-road branches are disabled in the reference and omitted.
    """
    smpmin = -1.e8
    qred = jnp.ones_like(frac_sno)
    hr = jnp.ones_like(frac_sno)
    soilalpha = jnp.full_like(frac_sno, c.SPVAL)

    wet_ice = c.ltype_mask(land, c.ISTWET, c.ISTICE, c.ISTICE_MEC)
    if wet_ice is True:
        return SoilAlphaOut(qred, hr, soilalpha)
    defaults = SoilAlphaOut(qred, hr, soilalpha)

    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    if sc is not False:
        i0 = c.NLEVSNO
        wx = (h2osoi_liq[:, i0] / c.DENH2O
              + h2osoi_ice[:, i0] / c.DENICE) / dz[:, i0]
        fac = jnp.clip(wx / watsat[:, 0], 0.01, 1.0)
        psit = jnp.maximum(smpmin, -sucsat[:, 0] * fac ** (-bsw[:, 0]))
        hr = c.lsel(sc, jnp.exp(psit / c.ROVERG / t_soisno[:, i0]), hr)
        qred = c.lsel(sc, (1.0 - frac_sno - frac_h2osfc) * hr
                      + frac_sno + frac_h2osfc, qred)
        soilalpha = c.lsel(sc, qred, soilalpha)
    elif land.ctype in (c.ICOL_SUNWALL, c.ICOL_SHADEWALL):
        qred = jnp.zeros_like(frac_sno)
    elif land.ctype in (c.ICOL_ROOF, c.ICOL_ROAD_IMPERV):
        qred = jnp.ones_like(frac_sno)
    out = SoilAlphaOut(qred, hr, soilalpha)
    return c.lsel(wet_ice, defaults, out)


def calc_soilbeta(land: c.LandType, frac_sno, frac_h2osfc, watsat, watfc,
                  h2osoi_liq, h2osoi_ice, dz) -> jnp.ndarray:
    """Reference: ``canopy_temperature_impl.hh:131-139``."""
    return surface_resistance.calc_soilevap_stress(
        land, frac_sno, frac_h2osfc, watsat, watfc, h2osoi_liq, h2osoi_ice,
        dz)


class HumiditiesOut(NamedTuple):
    qg_snow: jnp.ndarray
    qg_soil: jnp.ndarray
    qg: jnp.ndarray
    qg_h2osfc: jnp.ndarray
    dqgdT: jnp.ndarray


def humidities(land: c.LandType, snl, forc_q, forc_pbot, t_h2osfc, t_grnd,
               frac_sno, frac_sno_eff, frac_h2osfc, qred, hr,
               t_soisno) -> HumiditiesOut:
    """Specific humidities over snow/soil/surface water and d(qg)/dT.

    Reference: ``canopy_temperature_impl.hh:141-201`` (``humidities``).
    The reference's ``qsatg > forc_q && forc_q > qsatg`` guards are
    unsatisfiable and therefore dropped; the live dew-limit guard on the
    soil branch (``forc_q > hr*qsatg``) is kept.
    """
    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    if sc is not False:
        top_sno_t = take_layer(t_soisno, c.NLEVSNO - snl)
        qs_snow = qsat(top_sno_t, forc_pbot)
        qg_snow = qs_snow.qs
        dqgdT = frac_sno * qs_snow.qsdT

        qs_soil = qsat(t_soisno[:, c.NLEVSNO], forc_pbot)
        dew_soil = (qs_soil.qs > forc_q) & (forc_q > hr * qs_soil.qs)
        qsatg_soil = jnp.where(dew_soil, forc_q, qs_soil.qs)
        qsatgdT_soil = jnp.where(dew_soil, 0.0, qs_soil.qsdT)
        qg_soil = hr * qsatg_soil
        dqgdT = dqgdT + (1.0 - frac_sno - frac_h2osfc) * hr * qsatgdT_soil

        # snl==0: qg_snow tracks qg_soil so hs_top_snow == hs_top_soil in the
        # soil-temperature solve
        no_sno = snl == 0
        qg_snow = jnp.where(no_sno, qg_soil, qg_snow)
        dqgdT = jnp.where(no_sno, (1.0 - frac_h2osfc) * hr * dqgdT, dqgdT)

        qs_sfc = qsat(t_h2osfc, forc_pbot)
        qg_h2osfc = qs_sfc.qs
        dqgdT = dqgdT + frac_h2osfc * qs_sfc.qsdT
        qg = (frac_sno_eff * qg_snow
              + (1.0 - frac_sno_eff - frac_h2osfc) * qg_soil
              + frac_h2osfc * qg_h2osfc)
        soilcase = HumiditiesOut(qg_snow, qg_soil, qg, qg_h2osfc, dqgdT)
        if sc is True:
            return soilcase

    qs = qsat(t_grnd, forc_pbot)
    qg = qred * qs.qs
    dqgdT = qred * qs.qsdT
    dew = (qs.qs > forc_q) & (forc_q > qred * qs.qs)
    qg = jnp.where(dew, forc_q, qg)
    dqgdT = jnp.where(dew, 0.0, dqgdT)
    other = HumiditiesOut(qg, qg, qg, qg, dqgdT)
    if sc is False:
        return other
    return c.lsel(sc, soilcase, other)


class GroundPropertiesOut(NamedTuple):
    emg: jnp.ndarray
    emv: jnp.ndarray
    htvp: jnp.ndarray
    z0mg: jnp.ndarray
    z0hg: jnp.ndarray
    z0qg: jnp.ndarray
    z0mv: jnp.ndarray
    z0hv: jnp.ndarray
    z0qv: jnp.ndarray
    thv: jnp.ndarray
    z0m: jnp.ndarray
    displa: jnp.ndarray


def ground_properties(land: c.LandType, snl, frac_sno, forc_th, forc_q, elai,
                      esai, htop, displar_v, z0mr_v, h2osoi_liq,
                      h2osoi_ice) -> GroundPropertiesOut:
    """Emissivities, latent-heat selector, and roughness lengths.

    Reference: ``canopy_temperature_impl.hh:203-257`` (``ground_properties``).
    ``displar_v``/``z0mr_v`` are the PFT trait values for the domain's
    (static) vtype — scalars or [ncol] (the reference indexes trait vectors
    with ``Land.vtype``).
    """
    ice = c.ltype_mask(land, c.ISTICE, c.ISTICE_MEC)
    emg = c.lsel(ice, jnp.full_like(frac_sno, 0.97),
                 (1.0 - frac_sno) * 0.96 + frac_sno * 0.97)

    avmuir = 1.0
    emv = 1.0 - jnp.exp(-(elai + esai) / avmuir)

    liq_top = take_layer(h2osoi_liq, c.NLEVSNO - snl)
    ice_top = take_layer(h2osoi_ice, c.NLEVSNO - snl)
    htvp = jnp.where((liq_top <= 0.0) & (ice_top > 0.0), c.HSUB, c.HVAP)

    z0mg = jnp.where(frac_sno > 0.0, c.ZSNO, c.ZLND)
    z0m = z0mr_v * htop
    displa = displar_v * htop
    thv = forc_th * (1.0 + 0.61 * forc_q)

    return GroundPropertiesOut(emg, emv, htvp, z0mg, z0mg, z0mg, z0m, z0m,
                               z0m, thv, z0m, displa)


class ForcingHeightOut(NamedTuple):
    forc_hgt_u_patch: jnp.ndarray
    forc_hgt_t_patch: jnp.ndarray
    forc_hgt_q_patch: jnp.ndarray
    thm: jnp.ndarray


def forcing_height(land: c.LandType, veg_active, frac_veg_nosno, z0m, z0mg,
                   forc_t, displa, forc_hgt_u_patch, forc_hgt_t_patch,
                   forc_hgt_q_patch) -> ForcingHeightOut:
    """Patch-level forcing heights (+z0m+displa) and 2m-adjusted thm.

    Reference: ``canopy_temperature_impl.hh:259-296`` (``forcing_height``).
    """
    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    wet_ice = c.ltype_mask(land, c.ISTWET, c.ISTICE, c.ISTICE_MEC)
    if sc is True:
        add = jnp.where(frac_veg_nosno == 0, z0mg + displa, z0m + displa)
    elif wet_ice is True:
        add = z0mg
    elif sc is False and wet_ice is False:
        add = jnp.zeros_like(z0mg)  # urban: z_0_town + z_d_town == 0
    else:
        add = c.lsel(sc, jnp.where(frac_veg_nosno == 0, z0mg + displa,
                                   z0m + displa),
                     c.lsel(wet_ice, z0mg, jnp.zeros_like(z0mg)))
    add = jnp.where(veg_active, add, 0.0)

    u = forc_hgt_u_patch + add
    t = forc_hgt_t_patch + add
    q = forc_hgt_q_patch + add
    thm = forc_t + 0.0098 * t
    return ForcingHeightOut(u, t, q, thm)


class InitEnergyFluxesOut(NamedTuple):
    eflx_sh_tot: jnp.ndarray
    eflx_lh_tot: jnp.ndarray
    eflx_sh_veg: jnp.ndarray
    qflx_evap_tot: jnp.ndarray
    qflx_evap_veg: jnp.ndarray
    qflx_tran_veg: jnp.ndarray


def init_energy_fluxes(land: c.LandType, ncol_like) -> InitEnergyFluxesOut:
    """Zero the per-step energy fluxes.

    Reference: ``canopy_temperature_impl.hh:298-327``.
    """
    z = jnp.zeros_like(ncol_like)
    return InitEnergyFluxesOut(z, z, z, z, z, z)
