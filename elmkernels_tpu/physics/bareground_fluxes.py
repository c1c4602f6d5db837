"""Monin-Obukhov surface fluxes for snow/soil surfaces without vegetation
(frac_veg_nosno == 0) — batched over columns.

TPU-native rebuild of
``/root/reference/src/physics/bareground_fluxes_impl.hh:4-165`` (from ELM's
BareGroundFluxesMod.F90).  The fixed 3-iteration stability loop is unrolled;
masked columns (vegetated) pass their inputs through unchanged, matching
the reference's in-place no-op semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import friction_velocity as fv
from elmkernels_tpu.physics.qsat import qsat
from elmkernels_tpu.physics.math_utils import take_layer


class InitFluxOut(NamedTuple):
    dlrad: jnp.ndarray
    ulrad: jnp.ndarray
    zldis: jnp.ndarray
    displa: jnp.ndarray
    dth: jnp.ndarray
    dqh: jnp.ndarray
    obu: jnp.ndarray
    ur: jnp.ndarray
    um: jnp.ndarray


def initialize_flux(land: c.LandType, frac_veg_nosno, forc_u, forc_v, forc_q,
                    forc_th, forc_hgt_u_patch, thm, thv, t_grnd, qg, z0mg,
                    dlrad, ulrad, zldis, displa, dth, dqh, obu, ur,
                    um) -> InitFluxOut:
    """Reference: ``bareground_fluxes_impl.hh:6-27`` (``initialize_flux``).

    The trailing arguments carry prior values for masked (vegetated)
    columns.
    """
    if land.lakpoi or land.urbpoi:
        return InitFluxOut(dlrad, ulrad, zldis, displa, dth, dqh, obu, ur, um)
    m = frac_veg_nosno == 0

    ur_n = jnp.maximum(1.0, jnp.sqrt(forc_u * forc_u + forc_v * forc_v))
    dth_n = thm - t_grnd
    dqh_n = forc_q - qg
    zldis_n = forc_hgt_u_patch
    dthv = dth_n * (1.0 + 0.61 * forc_q) + 0.61 * forc_th * dqh_n
    mo = fv.monin_obukhov_length(ur_n, thv, dthv, zldis_n, z0mg)

    z = jnp.zeros_like(thm)
    return InitFluxOut(
        dlrad=jnp.where(m, z, dlrad), ulrad=jnp.where(m, z, ulrad),
        zldis=jnp.where(m, zldis_n, zldis), displa=jnp.where(m, z, displa),
        dth=jnp.where(m, dth_n, dth), dqh=jnp.where(m, dqh_n, dqh),
        obu=jnp.where(m, mo.obu, obu), ur=jnp.where(m, ur_n, ur),
        um=jnp.where(m, mo.um, um))


class StabilityOut(NamedTuple):
    z0hg: jnp.ndarray
    z0qg: jnp.ndarray
    obu: jnp.ndarray
    um: jnp.ndarray
    temp1: jnp.ndarray
    temp2: jnp.ndarray
    temp12m: jnp.ndarray
    temp22m: jnp.ndarray
    ustar: jnp.ndarray


def stability_iteration(land: c.LandType, frac_veg_nosno, forc_hgt_t_patch,
                        forc_hgt_u_patch, forc_hgt_q_patch, z0mg, zldis,
                        displa, dth, dqh, ur, forc_q, forc_th, thv, z0hg,
                        z0qg, obu, um, temp1, temp2, temp12m, temp22m,
                        ustar) -> StabilityOut:
    """Fixed 3-iteration Monin-Obukhov stability loop, unrolled.

    Reference: ``bareground_fluxes_impl.hh:29-78`` (``stability_iteration``).
    """
    if land.lakpoi or land.urbpoi:
        return StabilityOut(z0hg, z0qg, obu, um, temp1, temp2, temp12m,
                            temp22m, ustar)
    m = frac_veg_nosno == 0
    beta = 1.0
    zii = 1000.0

    z0hg_i, z0qg_i, obu_i, um_i = z0hg, z0qg, obu, um
    t1_i, t2_i, t12_i, t22_i, ustar_i = temp1, temp2, temp12m, temp22m, ustar
    for _ in range(3):
        ustar_i = fv.friction_velocity_wind(forc_hgt_u_patch, displa, um_i,
                                            obu_i, z0mg)
        t1_i = fv.friction_velocity_temp(forc_hgt_t_patch, displa, obu_i,
                                         z0hg_i)
        t2_i = fv.friction_velocity_humidity(forc_hgt_q_patch,
                                             forc_hgt_t_patch, displa, obu_i,
                                             z0hg_i, z0qg_i, t1_i)
        t12_i = fv.friction_velocity_temp2m(obu_i, z0hg_i)
        t22_i = fv.friction_velocity_humidity2m(obu_i, z0hg_i, z0qg_i, t12_i)

        tstar = t1_i * dth
        qstar = t2_i * dqh
        thvstar = tstar * (1.0 + 0.61 * forc_q) + 0.61 * forc_th * qstar
        z0hg_i = z0mg / jnp.exp(0.13 * (ustar_i * z0mg / 1.5e-5) ** 0.45)
        z0qg_i = z0hg_i
        zeta = zldis * c.VKC * c.GRAV * thvstar / (ustar_i ** 2.0 * thv)

        stab = zeta >= 0.0
        zeta = jnp.where(stab, jnp.clip(zeta, 0.01, 2.0),
                         jnp.clip(zeta, -100.0, -0.01))
        wc = beta * jnp.maximum(
            -c.GRAV * ustar_i * thvstar * zii / thv, 0.0) ** 0.333
        um_i = jnp.where(stab, jnp.maximum(ur, 0.1),
                         jnp.sqrt(ur * ur + wc * wc))
        obu_i = zldis / zeta

    return StabilityOut(
        z0hg=jnp.where(m, z0hg_i, z0hg), z0qg=jnp.where(m, z0qg_i, z0qg),
        obu=jnp.where(m, obu_i, obu), um=jnp.where(m, um_i, um),
        temp1=jnp.where(m, t1_i, temp1), temp2=jnp.where(m, t2_i, temp2),
        temp12m=jnp.where(m, t12_i, temp12m),
        temp22m=jnp.where(m, t22_i, temp22m),
        ustar=jnp.where(m, ustar_i, ustar))


class ComputeFluxOut(NamedTuple):
    cgrnds: jnp.ndarray
    cgrndl: jnp.ndarray
    cgrnd: jnp.ndarray
    eflx_sh_grnd: jnp.ndarray
    eflx_sh_tot: jnp.ndarray
    eflx_sh_snow: jnp.ndarray
    eflx_sh_soil: jnp.ndarray
    eflx_sh_h2osfc: jnp.ndarray
    qflx_evap_soi: jnp.ndarray
    qflx_evap_tot: jnp.ndarray
    qflx_ev_snow: jnp.ndarray
    qflx_ev_soil: jnp.ndarray
    qflx_ev_h2osfc: jnp.ndarray
    t_ref2m: jnp.ndarray
    q_ref2m: jnp.ndarray
    rh_ref2m: jnp.ndarray


def compute_flux(land: c.LandType, frac_veg_nosno, snl, forc_rho, soilbeta,
                 dqgdT, htvp, t_h2osfc, qg_snow, qg_soil, qg_h2osfc,
                 t_soisno, forc_pbot, dth, dqh, temp1, temp2, temp12m,
                 temp22m, ustar, forc_q, thm, eflx_sh_grnd, eflx_sh_tot,
                 eflx_sh_snow, eflx_sh_soil, eflx_sh_h2osfc, qflx_evap_soi,
                 qflx_evap_tot, qflx_ev_snow, qflx_ev_soil, qflx_ev_h2osfc,
                 t_ref2m, q_ref2m, rh_ref2m) -> ComputeFluxOut:
    """Sensible/latent heat fluxes, flux derivatives, and 2m diagnostics.

    Reference: ``bareground_fluxes_impl.hh:80-163`` (``compute_flux``).
    """
    zero = jnp.zeros_like(thm)
    if land.lakpoi:
        return ComputeFluxOut(zero, zero, zero, eflx_sh_grnd, eflx_sh_tot,
                              eflx_sh_snow, eflx_sh_soil, eflx_sh_h2osfc,
                              qflx_evap_soi, qflx_evap_tot, qflx_ev_snow,
                              qflx_ev_soil, qflx_ev_h2osfc, t_ref2m, q_ref2m,
                              rh_ref2m)
    if land.urbpoi:
        m = jnp.zeros_like(frac_veg_nosno, dtype=bool)
    else:
        m = frac_veg_nosno == 0

    rah = 1.0 / (temp1 * ustar)
    raw = 1.0 / (temp2 * ustar)
    raih = forc_rho * c.CPAIR / rah
    raiw = jnp.where(dqh > 0.0, forc_rho / raw, soilbeta * forc_rho / raw)

    cgrnds_n = raih
    cgrndl_n = raiw * dqgdT
    cgrnd_n = cgrnds_n + htvp * cgrndl_n

    sh_grnd = -raih * dth
    top_sno_t = take_layer(t_soisno, c.NLEVSNO - snl)
    sh_snow = -raih * (thm - top_sno_t)
    sh_soil = -raih * (thm - t_soisno[:, c.NLEVSNO])
    sh_h2osfc = -raih * (thm - t_h2osfc)

    ev_soi = -raiw * dqh
    ev_snow = -raiw * (forc_q - qg_snow)
    ev_soil = -raiw * (forc_q - qg_soil)
    ev_h2osfc = -raiw * (forc_q - qg_h2osfc)

    t2m = thm + temp1 * dth * (1.0 / temp12m - 1.0 / temp1)
    q2m = forc_q + temp2 * dqh * (1.0 / temp22m - 1.0 / temp2)
    qs2m = qsat(t2m, forc_pbot)
    rh2m = jnp.minimum(100.0, q2m / qs2m.qs * 100.0)

    return ComputeFluxOut(
        cgrnds=jnp.where(m, cgrnds_n, zero),
        cgrndl=jnp.where(m, cgrndl_n, zero),
        cgrnd=jnp.where(m, cgrnd_n, zero),
        eflx_sh_grnd=jnp.where(m, sh_grnd, eflx_sh_grnd),
        eflx_sh_tot=jnp.where(m, sh_grnd, eflx_sh_tot),
        eflx_sh_snow=jnp.where(m, sh_snow, eflx_sh_snow),
        eflx_sh_soil=jnp.where(m, sh_soil, eflx_sh_soil),
        eflx_sh_h2osfc=jnp.where(m, sh_h2osfc, eflx_sh_h2osfc),
        qflx_evap_soi=jnp.where(m, ev_soi, qflx_evap_soi),
        qflx_evap_tot=jnp.where(m, ev_soi, qflx_evap_tot),
        qflx_ev_snow=jnp.where(m, ev_snow, qflx_ev_snow),
        qflx_ev_soil=jnp.where(m, ev_soil, qflx_ev_soil),
        qflx_ev_h2osfc=jnp.where(m, ev_h2osfc, qflx_ev_h2osfc),
        t_ref2m=jnp.where(m, t2m, t_ref2m),
        q_ref2m=jnp.where(m, q2m, q_ref2m),
        rh_ref2m=jnp.where(m, rh2m, rh_ref2m))
