"""Absorbed, transmitted, and reflected solar radiation — batched over
columns.

TPU-native rebuild of the reference's surface-radiation kernels
(``/root/reference/src/physics/surface_radiation_impl.hh:5-240``, derived
from ELM's SurfaceRadiationMod.F90).  Band loops (numrad=2) are unrolled
into the trailing array axis; the per-snow-layer absorption profile uses
the SNICAR flux factors with masked redistribution fallbacks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c


class TotalAbsorbedOut(NamedTuple):
    sabv: jnp.ndarray
    fsa: jnp.ndarray
    sabg: jnp.ndarray
    sabg_soil: jnp.ndarray
    sabg_snow: jnp.ndarray
    trd: jnp.ndarray  # [ncol, numrad] transmitted direct flux onto ground
    tri: jnp.ndarray  # [ncol, numrad] transmitted diffuse flux onto ground


def total_absorbed_radiation(land: c.LandType, snl, ftdd, ftid, ftii,
                             forc_solad, forc_solai, fabd, fabi, albsod,
                             albsoi, albsnd, albsni, albgrd,
                             albgri) -> TotalAbsorbedOut:
    """Canopy-absorbed and ground-absorbed solar radiation by band.

    Reference: ``surface_radiation_impl.hh:28-73``
    (``total_absorbed_radiation``); starts from the zero state of
    ``initialize_flux`` (``surface_radiation_impl.hh:7-26``), which is
    subsumed here since outputs are freshly computed.
    """
    cad = forc_solad * fabd
    cai = forc_solai * fabi
    sabv = jnp.sum(cad + cai, axis=-1)
    fsa = sabv

    trd = forc_solad * ftdd
    tri = forc_solad * ftid + forc_solai * ftii

    sabg_soil = jnp.sum(trd * (1.0 - albsod) + tri * (1.0 - albsoi), axis=-1)
    sabg_snow = jnp.sum(trd * (1.0 - albsnd) + tri * (1.0 - albsni), axis=-1)
    sabg = jnp.sum(trd * (1.0 - albgrd) + tri * (1.0 - albgri), axis=-1)
    fsa = fsa + sabg

    no_snow = snl == 0
    if c.SUBGRIDFLAG == 0:
        no_snow = jnp.ones_like(no_snow)
    sabg_snow = jnp.where(no_snow, sabg, sabg_snow)
    sabg_soil = jnp.where(no_snow, sabg, sabg_soil)

    return TotalAbsorbedOut(sabv, fsa, sabg, sabg_soil, sabg_snow, trd, tri)


def layer_absorbed_radiation(land: c.LandType, snl, sabg, sabg_snow,
                             snow_depth, flx_absdv, flx_absdn, flx_absiv,
                             flx_absin, trd, tri) -> jnp.ndarray:
    """Absorbed solar flux per snow layer + top soil layer
    (``sabg_lyr``, shape [ncol, NLEVSNO+1]).

    Scales the SNICAR flux-absorption factors by the transmitted band
    fluxes; when the stored factors disagree with the current layer count
    (radiation not computed every step) the energy is redistributed 60/40
    or 75/25 into the top layers.  Reference:
    ``surface_radiation_impl.hh:75-175``.
    """
    nsno = c.NLEVSNO
    lev = jnp.arange(nsno + 1)

    # CASE 2: snow layers present — SNICAR flux factors
    sabg_lyr = (flx_absdv * trd[:, 0:1] + flx_absdn * trd[:, 1:2]
                + flx_absiv * tri[:, 0:1] + flx_absin * tri[:, 1:2])
    active = lev[None, :] >= (nsno - snl)[:, None]
    sabg_snl_sum = jnp.sum(jnp.where(active, sabg_lyr, 0.0), axis=-1)

    # redistribution when stored factors mismatch the current snow pack
    mismatch = jnp.abs(sabg_snl_sum - sabg_snow) > 0.00001
    one_layer = snl == 1
    top = (nsno - snl)[:, None]
    redis_1 = jnp.where(lev[None, :] == nsno - 1, sabg_snow[:, None] * 0.6,
                        jnp.where(lev[None, :] == nsno,
                                  sabg_snow[:, None] * 0.4, 0.0))
    redis_n = jnp.where(lev[None, :] == top, sabg_snow[:, None] * 0.75,
                        jnp.where(lev[None, :] == top + 1,
                                  sabg_snow[:, None] * 0.25, 0.0))
    redis = jnp.where(one_layer[:, None], redis_1, redis_n)
    sabg_lyr = jnp.where(mismatch[:, None], redis, sabg_lyr)

    if c.SUBGRIDFLAG == 0:
        shallow = snow_depth < 0.1
        shal_1 = jnp.where(lev[None, :] == nsno - 1, sabg[:, None], 0.0)
        shal_n = redis_n
        shal = jnp.where(one_layer[:, None], shal_1, shal_n)
        sabg_lyr = jnp.where(shallow[:, None], shal, sabg_lyr)

    # CASE 1: no snow layers — everything into the top soil layer
    bare = jnp.where(lev[None, :] == nsno, sabg[:, None], 0.0)
    sabg_lyr = jnp.where((snl == 0)[:, None], bare, sabg_lyr)
    return sabg_lyr


def reflected_radiation(land: c.LandType, albd, albi, forc_solad,
                        forc_solai) -> jnp.ndarray:
    """Reflected solar radiation ``fsr``.

    Reference: ``surface_radiation_impl.hh:177-198``; urban and non-urban
    formulas reduce to the same sum over bands.
    """
    return jnp.sum(albd * forc_solad + albi * forc_solai, axis=-1)


class SunShadeOut(NamedTuple):
    parsun_z: jnp.ndarray  # [ncol, nlevcan]
    parsha_z: jnp.ndarray
    laisun_z: jnp.ndarray
    laisha_z: jnp.ndarray
    laisun: jnp.ndarray
    laisha: jnp.ndarray


def canopy_sunshade_fractions(land: c.LandType, nrad, elai, tlai_z, fsun_z,
                              forc_solad, forc_solai, fabd_sun_z, fabd_sha_z,
                              fabi_sun_z, fabi_sha_z) -> SunShadeOut:
    """Sunlit/shaded LAI and absorbed-PAR profiles per canopy layer.

    Reference: ``surface_radiation_impl.hh:200-238``
    (``canopy_sunshade_fractions``).  ``nrad`` (active canopy layers)
    becomes a per-column mask over the nlevcan axis.
    """
    ipar = 0  # PAR band index (visible)
    lev = jnp.arange(tlai_z.shape[-1])
    m = lev[None, :] < nrad[:, None]

    laisun_z = jnp.where(m, tlai_z * fsun_z, 0.0)
    laisha_z = jnp.where(m, tlai_z * (1.0 - fsun_z), 0.0)
    laisun = jnp.sum(laisun_z, axis=-1)
    laisha = jnp.sum(laisha_z, axis=-1)

    parsun_z = jnp.where(
        m, forc_solad[:, ipar:ipar + 1] * fabd_sun_z
        + forc_solai[:, ipar:ipar + 1] * fabi_sun_z, 0.0)
    parsha_z = jnp.where(
        m, forc_solad[:, ipar:ipar + 1] * fabd_sha_z
        + forc_solai[:, ipar:ipar + 1] * fabi_sha_z, 0.0)

    return SunShadeOut(parsun_z, parsha_z, laisun_z, laisha_z, laisun, laisha)
