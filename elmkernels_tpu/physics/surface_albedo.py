"""Surface/canopy albedo: soil albedo, ground albedo, SNICAR flux-factor
weighting, canopy layers, and the two-stream canopy radiative transfer —
batched over columns.

TPU-native rebuild of
``/root/reference/src/physics/surface_albedo_impl.hh:35-756`` (from ELM's
SurfaceAlbedoMod.F90).  ``nlevcan == 1`` (sun/shade big leaf) is compiled
statically; the vegetated/bare/night branches become batch masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.math_utils import safe_div

_MPE = 1.e-6   # detail::mpe (surface_albedo.h)
_EXTKN = 0.3   # detail::extkn — nitrogen allocation extinction coefficient


class PFTAlbParams(NamedTuple):
    """Leaf/stem optical properties (reference ``PFTDataAlb``,
    ``pft_data.h:20-33``): rhol/rhos/taul/taus per band + leaf angle xl.

    Homogeneous domain: [numrad] tuples + scalar xl (fold to constants).
    Heterogeneous domain: [ncol, numrad] arrays + [ncol] xl (per-column
    gather of the trait matrix, like ``get_pft_alb(alb_pft[c], vtype[c])``).
    """
    rhol: jnp.ndarray  # [numrad] or [ncol, numrad]
    rhos: jnp.ndarray
    taul: jnp.ndarray
    taus: jnp.ndarray
    xl: float          # or [ncol]


def _band(v, ib: int):
    """Band ib of an optics trait: tuple/[numrad] -> scalar;
    [ncol, numrad] -> [ncol]."""
    if isinstance(v, (tuple, list)):
        return v[ib]
    return v[:, ib] if getattr(v, "ndim", 1) == 2 else v[ib]


class InitTimestepOut(NamedTuple):
    vcmaxcintsun: jnp.ndarray
    vcmaxcintsha: jnp.ndarray
    mss_cnc_aer_in_fdb: jnp.ndarray  # [ncol, NLEVSNO, SNO_NBR_AER]


def init_timestep(land: c.LandType, elai, mss_cnc_bcphi, mss_cnc_bcpho,
                  mss_cnc_dst1, mss_cnc_dst2, mss_cnc_dst3,
                  mss_cnc_dst4) -> InitTimestepOut:
    """Leaf-to-canopy scaling init + aerosol feedback concentrations.

    Reference: ``surface_albedo_impl.hh:88-151`` (``init_timestep``).  The
    band/flux zeroing is subsumed: downstream functions return freshly
    computed (or zero) values rather than mutating state.
    """
    vcmaxcintsun = jnp.zeros_like(elai)
    vcs = (1.0 - jnp.exp(-_EXTKN * elai)) / _EXTKN
    vcmaxcintsha = jnp.where(elai > 0.0, safe_div(vcs, elai, elai > 0.0), 0.0)

    # [ncol, nlevsno, 8]: bcphi, bcpho, (OC1, OC2 ignored), dst1..dst4
    zeros = jnp.zeros_like(mss_cnc_bcphi)
    mss = jnp.stack([mss_cnc_bcphi, mss_cnc_bcpho, zeros, zeros,
                     mss_cnc_dst1, mss_cnc_dst2, mss_cnc_dst3, mss_cnc_dst4],
                    axis=-1)
    return InitTimestepOut(vcmaxcintsun, vcmaxcintsha, mss)


class SoilAlbedoOut(NamedTuple):
    albsod: jnp.ndarray  # [ncol, numrad]
    albsoi: jnp.ndarray


def soil_albedo(land: c.LandType, snl, t_grnd, coszen, h2osoi_vol, albsat,
                albdry) -> SoilAlbedoOut:
    """Direct/diffuse soil (or ice/lake) albedo by band.

    Reference: ``surface_albedo_impl.hh:689-754`` (``soil_albedo``).
    ``h2osoi_vol`` is soil-only (layer 0 = top soil layer); ``albsat``/
    ``albdry`` are per-column color-class albedos by band.
    """
    albice = jnp.array([0.8, 0.55])
    alblak = jnp.array([0.60, 0.40])
    alblakwi = jnp.array([0.10, 0.10])
    calb = 95.6

    lit = (coszen > 0.0)[:, None]
    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    icem = c.ltype_mask(land, c.ISTICE, c.ISTICE_MEC)
    lakem = c.ltype_mask(land, c.ISTDLAK)
    if sc is True:
        inc = jnp.maximum(0.11 - 0.40 * h2osoi_vol[:, 0], 0.0)
        albsod = jnp.minimum(albsat + inc[:, None], albdry)
        albsoi = albsod
    elif icem is True:
        albsod = jnp.broadcast_to(albice, albsat.shape)
        albsoi = albsod
    elif lakem is True:
        sicefr = 1.0 - jnp.exp(-calb * (c.TFRZ - t_grnd) / c.TFRZ)
        sod = (sicefr[:, None] * alblak
               + (1.0 - sicefr)[:, None]
               * jnp.maximum(alblakwi,
                             0.05 / (jnp.maximum(0.001, coszen)[:, None]
                                     + 0.15)))
        soi = (sicefr[:, None] * alblak
               + (1.0 - sicefr)[:, None] * jnp.maximum(alblakwi, 0.10))
        frozen = (snl == 0)[:, None]
        albsod = jnp.where(frozen, sod, jnp.broadcast_to(alblak, sod.shape))
        albsoi = jnp.where(frozen, soi, albsod)
    elif sc is False and icem is False and lakem is False:  # wetland
        albsod = jnp.broadcast_to(alblak, albsat.shape)
        albsoi = albsod
    else:  # per-column ltype: select among the four surfaces
        inc = jnp.maximum(0.11 - 0.40 * h2osoi_vol[:, 0], 0.0)
        sod_sc = jnp.minimum(albsat + inc[:, None], albdry)
        sod_ice = jnp.broadcast_to(albice, albsat.shape)
        sicefr = 1.0 - jnp.exp(-calb * (c.TFRZ - t_grnd) / c.TFRZ)
        sod_l = (sicefr[:, None] * alblak
                 + (1.0 - sicefr)[:, None]
                 * jnp.maximum(alblakwi,
                               0.05 / (jnp.maximum(0.001, coszen)[:, None]
                                       + 0.15)))
        soi_l = (sicefr[:, None] * alblak
                 + (1.0 - sicefr)[:, None] * jnp.maximum(alblakwi, 0.10))
        frozen = (snl == 0)[:, None]
        alblak_b = jnp.broadcast_to(alblak, albsat.shape)
        sod_lake = jnp.where(frozen, sod_l, alblak_b)
        soi_lake = jnp.where(frozen, soi_l, sod_lake)
        albsod = c.lsel(sc, sod_sc,
                        c.lsel(icem, sod_ice,
                               c.lsel(lakem, sod_lake, alblak_b)))
        albsoi = c.lsel(sc, sod_sc,
                        c.lsel(icem, sod_ice,
                               c.lsel(lakem, soi_lake, alblak_b)))
    zero = jnp.zeros_like(albsod)
    return SoilAlbedoOut(jnp.where(lit, albsod, zero),
                         jnp.where(lit, albsoi, zero))


class GroundAlbedoOut(NamedTuple):
    albgrd: jnp.ndarray
    albgri: jnp.ndarray


def ground_albedo(land: c.LandType, coszen, frac_sno, albsod, albsoi, albsnd,
                  albsni) -> GroundAlbedoOut:
    """Snow-fraction-weighted ground albedo.

    Reference: ``surface_albedo_impl.hh:153-167`` (``ground_albedo``).
    """
    lit = (coszen > 0.0)[:, None]
    fs = frac_sno[:, None]
    albgrd = jnp.where(lit, albsod * (1.0 - fs) + albsnd * fs, 0.0)
    albgri = jnp.where(lit, albsoi * (1.0 - fs) + albsni * fs, 0.0)
    return GroundAlbedoOut(albgrd, albgri)


class FluxAbsorptionOut(NamedTuple):
    flx_absdv: jnp.ndarray  # [ncol, NLEVSNO+1]
    flx_absdn: jnp.ndarray
    flx_absiv: jnp.ndarray
    flx_absin: jnp.ndarray


def flux_absorption_factor(land: c.LandType, coszen, frac_sno, albsod,
                           albsoi, albsnd, albsni, flx_absd_snw,
                           flx_absi_snw) -> FluxAbsorptionOut:
    """Snow-fraction weighting of per-layer SNICAR absorption factors.

    Reference: ``surface_albedo_impl.hh:169-211``
    (``flux_absorption_factor``).  flx_abs[di]_snw are [ncol, NLEVSNO+1,
    numrad].
    """
    lit = (coszen > 0.0)[:, None]

    lakem = (True if c.SUBGRIDFLAG == 0
             else c.ltype_mask(land, c.ISTDLAK))
    if lakem is not False:
        fs = frac_sno[:, None]
        def wgt(flx, albsfc, albsnow):
            return (flx * fs + (1.0 - fs) * (1.0 - albsfc)
                    * safe_div(flx, 1.0 - albsnow, albsnow != 1.0))
        dv_l = wgt(flx_absd_snw[:, :, 0], albsod[:, 0:1], albsnd[:, 0:1])
        dn_l = wgt(flx_absd_snw[:, :, 1], albsod[:, 1:2], albsnd[:, 1:2])
        iv_l = wgt(flx_absi_snw[:, :, 0], albsoi[:, 0:1], albsni[:, 0:1])
        inn_l = wgt(flx_absi_snw[:, :, 1], albsoi[:, 1:2], albsni[:, 1:2])
    if lakem is not True:
        dv_s = flx_absd_snw[:, :, 0] * (1.0 - albsnd[:, 0:1])
        dn_s = flx_absd_snw[:, :, 1] * (1.0 - albsnd[:, 1:2])
        iv_s = flx_absi_snw[:, :, 0] * (1.0 - albsni[:, 0:1])
        inn_s = flx_absi_snw[:, :, 1] * (1.0 - albsni[:, 1:2])
    if lakem is True:
        dv, dn, iv, inn = dv_l, dn_l, iv_l, inn_l
    elif lakem is False:
        dv, dn, iv, inn = dv_s, dn_s, iv_s, inn_s
    else:
        dv, dn, iv, inn = c.lsel(lakem, (dv_l, dn_l, iv_l, inn_l),
                                 (dv_s, dn_s, iv_s, inn_s))
    zero = jnp.zeros_like(dv)
    return FluxAbsorptionOut(jnp.where(lit, dv, zero),
                             jnp.where(lit, dn, zero),
                             jnp.where(lit, iv, zero),
                             jnp.where(lit, inn, zero))


class CanopyLayerOut(NamedTuple):
    nrad: jnp.ndarray
    tlai_z: jnp.ndarray  # [ncol, nlevcan]
    tsai_z: jnp.ndarray
    fsun_z: jnp.ndarray
    fabd_sun_z: jnp.ndarray
    fabd_sha_z: jnp.ndarray
    fabi_sun_z: jnp.ndarray
    fabi_sha_z: jnp.ndarray


def canopy_layer_lai(land: c.LandType, elai, esai, tlai,
                     tsai) -> CanopyLayerOut:
    """Canopy layer LAI/SAI assignment.

    Reference: ``surface_albedo_impl.hh:213-319`` (``canopy_layer_lai``).
    The sun/shade big-leaf configuration (nlevcan == 1, static) is the only
    compiled path: one layer holding the full canopy.
    """
    assert c.NLEVCAN == 1, "multi-layer canopy not yet implemented"
    nrad = jnp.ones_like(elai, dtype=jnp.int32)
    tlai_z = elai[:, None]
    tsai_z = esai[:, None]
    z = jnp.zeros_like(tlai_z)
    return CanopyLayerOut(nrad, tlai_z, tsai_z, z, z, z, z, z)


class TwoStreamOut(NamedTuple):
    albd: jnp.ndarray      # [ncol, numrad]
    ftid: jnp.ndarray
    ftdd: jnp.ndarray
    fabd: jnp.ndarray
    fabd_sun: jnp.ndarray
    fabd_sha: jnp.ndarray
    albi: jnp.ndarray
    ftii: jnp.ndarray
    fabi: jnp.ndarray
    fabi_sun: jnp.ndarray
    fabi_sha: jnp.ndarray
    fsun_z: jnp.ndarray    # [ncol, nlevcan]
    fabd_sun_z: jnp.ndarray
    fabd_sha_z: jnp.ndarray
    fabi_sun_z: jnp.ndarray
    fabi_sha_z: jnp.ndarray
    vcmaxcintsun: jnp.ndarray
    vcmaxcintsha: jnp.ndarray


def two_stream_solver(land: c.LandType, nrad, coszen, t_veg, fwet, elai,
                      esai, tlai_z, tsai_z, albgrd, albgri,
                      alb_pft: PFTAlbParams, vcmaxcintsun,
                      vcmaxcintsha) -> TwoStreamOut:
    """Dickinson/Sellers two-stream canopy radiative transfer, direct +
    diffuse, per band, with sun/shade partitioning and leaf-to-canopy
    scaling coefficients.

    Reference: ``surface_albedo_impl.hh:321-687`` (``two_stream_solver``);
    ``vegsol``/``novegsol`` masks from lines 67-86.  nlevcan == 1 only.
    """
    omegas = (0.8, 0.4)
    betads = 0.5
    betais = 0.5

    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    if land.urbpoi or sc is False:
        veg = jnp.zeros_like(coszen, dtype=bool)
    elif sc is True:
        veg = (coszen > 0.0) & ((elai + esai) > 0.0)
    else:
        veg = sc & (coszen > 0.0) & ((elai + esai) > 0.0)
    noveg = (coszen > 0.0) & ~veg
    dark = ~(veg | noveg)

    wl = elai / jnp.maximum(elai + esai, _MPE)
    ws = esai / jnp.maximum(elai + esai, _MPE)

    cosz = jnp.maximum(0.001, coszen)
    chil = jnp.clip(alb_pft.xl, -0.4, 0.6)
    chil = jnp.where(jnp.abs(chil) <= 0.01, 0.01, chil)

    phi1 = 0.5 - 0.633 * chil - 0.330 * chil * chil
    phi2 = 0.877 * (1.0 - 2.0 * phi1)
    gdir = phi1 + phi2 * cosz
    twostext = gdir / cosz
    avmu = (1.0 - phi1 / phi2 * jnp.log((phi1 + phi2) / phi1)) / phi2
    temp0 = gdir + phi2 * cosz
    temp1 = phi1 * cosz
    temp2 = 1.0 - temp1 / temp0 * jnp.log((temp1 + temp0) / temp1)

    # per-band outputs, collected then stacked
    outs = {k: [] for k in ("albd", "ftid", "ftdd", "fabd", "fabd_sun",
                            "fabd_sha", "albi", "ftii", "fabi", "fabi_sun",
                            "fabi_sha")}
    fsun_z0 = None
    per_layer = {}

    for ib in range(c.NUMRAD):
        rho = jnp.maximum(_band(alb_pft.rhol, ib) * wl
                          + _band(alb_pft.rhos, ib) * ws, _MPE)
        tau = jnp.maximum(_band(alb_pft.taul, ib) * wl
                          + _band(alb_pft.taus, ib) * ws, _MPE)

        omegal = rho + tau
        asu = 0.5 * omegal * gdir / temp0 * temp2
        betadl = (1.0 + avmu * twostext) / (omegal * avmu * twostext) * asu
        betail = (0.5 * ((rho + tau) + (rho - tau)
                         * ((1.0 + chil) / 2.0) ** 2.0) / omegal)

        snowy = t_veg <= c.TFRZ
        om_s = (1.0 - fwet) * omegal + fwet * omegas[ib]
        omega = jnp.where(snowy, om_s, omegal)
        betad = jnp.where(
            snowy, ((1.0 - fwet) * omegal * betadl
                    + fwet * omegas[ib] * betads) / om_s, betadl)
        betai = jnp.where(
            snowy, ((1.0 - fwet) * omegal * betail
                    + fwet * omegas[ib] * betais) / om_s, betail)

        b = 1.0 - omega + omega * betai
        c1 = omega * betai
        tmp0 = avmu * twostext
        d = tmp0 * omega * betad
        f = tmp0 * omega * (1.0 - betad)
        tmp1b = b * b - c1 * c1
        h = jnp.sqrt(jnp.maximum(tmp1b, 0.0)) / avmu
        sigma = tmp0 * tmp0 - tmp1b
        p1 = b + avmu * h
        p2 = b - avmu * h
        p3 = b + tmp0
        p4 = b - tmp0

        t1 = jnp.minimum(h * (elai + esai), 40.0)
        s1 = jnp.exp(-t1)
        t1d = jnp.minimum(twostext * (elai + esai), 40.0)
        s2 = jnp.exp(-t1d)

        agrd = albgrd[:, ib]
        agri = albgri[:, ib]

        # ---- direct beam ----
        u1 = b - safe_div(c1, agrd, agrd != 0.0)
        u2 = b - c1 * agrd
        u3 = f + c1 * agrd
        tmp2b = u1 - avmu * h
        tmp3 = u1 + avmu * h
        d1 = p1 * tmp2b / s1 - p2 * tmp3 * s1
        tmp4 = u2 + avmu * h
        tmp5 = u2 - avmu * h
        d2 = tmp4 / s1 - tmp5 * s1
        h1 = -d * p4 - c1 * f
        sigma_s = jnp.where(sigma != 0.0, sigma, 1.0)
        tmp6 = d - h1 * p3 / sigma_s
        tmp7 = (d - c1 - h1 / sigma_s * (u1 + tmp0)) * s2
        h2 = (tmp6 * tmp2b / s1 - p2 * tmp7) / d1
        h3 = -(tmp6 * tmp3 * s1 - p1 * tmp7) / d1
        h4 = -f * p3 - c1 * d
        tmp8 = h4 / sigma_s
        tmp9 = (u3 - tmp8 * (u2 - tmp0)) * s2
        h5 = -(tmp8 * tmp4 / s1 + tmp9) / d2
        h6 = (tmp8 * tmp5 * s1 + tmp9) / d2

        albd = h1 / sigma_s + h2 + h3
        ftid = h4 * s2 / sigma_s + h5 * s1 + h6 / s1
        ftdd = s2
        fabd = 1.0 - albd - (1.0 - agrd) * ftdd - (1.0 - agri) * ftid

        a1 = (h1 / sigma_s * (1.0 - s2 * s2) / (2.0 * twostext)
              + h2 * (1.0 - s2 * s1) / (twostext + h)
              + h3 * (1.0 - s2 / s1) / (twostext - h))
        a2 = (h4 / sigma_s * (1.0 - s2 * s2) / (2.0 * twostext)
              + h5 * (1.0 - s2 * s1) / (twostext + h)
              + h6 * (1.0 - s2 / s1) / (twostext - h))

        fabd_sun = (1.0 - omega) * (1.0 - s2 + 1.0 / avmu * (a1 + a2))
        fabd_sha = fabd - fabd_sun

        # ---- diffuse ----
        u1i = b - safe_div(c1, agri, agri != 0.0)
        u2i = b - c1 * agri
        tmp2i = u1i - avmu * h
        tmp3i = u1i + avmu * h
        d1i = p1 * tmp2i / s1 - p2 * tmp3i * s1
        tmp4i = u2i + avmu * h
        tmp5i = u2i - avmu * h
        d2i = tmp4i / s1 - tmp5i * s1
        h7 = (c1 * tmp2i) / (d1i * s1)
        h8 = (-c1 * tmp3i * s1) / d1i
        h9 = tmp4i / (d2i * s1)
        h10 = (-tmp5i * s1) / d2i

        albi = h7 + h8
        ftii = h9 * s1 + h10 / s1
        fabi = 1.0 - albi - (1.0 - agri) * ftii

        a1i = (h7 * (1.0 - s2 * s1) / (twostext + h)
               + h8 * (1.0 - s2 / s1) / (twostext - h))
        a2i = (h9 * (1.0 - s2 * s1) / (twostext + h)
               + h10 * (1.0 - s2 / s1) / (twostext - h))

        fabi_sun = (1.0 - omega) / avmu * (a1i + a2i)
        fabi_sha = fabi - fabi_sun

        if ib == 0:
            # sunlit fraction and per-layer absorbed PAR (nlevcan == 1)
            fsun = (1.0 - s2) / t1d
            laisum = elai + esai
            fabd_sun_z = fabd_sun / (fsun * laisum)
            fabi_sun_z = fabi_sun / (fsun * laisum)
            fabd_sha_z = fabd_sha / ((1.0 - fsun) * laisum)
            fabi_sha_z = fabi_sha / ((1.0 - fsun) * laisum)

            extkb = twostext
            vsun = (1.0 - jnp.exp(-(_EXTKN + extkb) * elai)) / (_EXTKN + extkb)
            vsha = (1.0 - jnp.exp(-_EXTKN * elai)) / _EXTKN - vsun
            haslai = elai > 0.0
            vsun = jnp.where(haslai,
                             safe_div(vsun, fsun * elai, haslai), 0.0)
            vsha = jnp.where(haslai,
                             safe_div(vsha, (1.0 - fsun) * elai, haslai), 0.0)
            fsun_z0 = fsun
            per_layer = dict(fabd_sun_z=fabd_sun_z, fabi_sun_z=fabi_sun_z,
                             fabd_sha_z=fabd_sha_z, fabi_sha_z=fabi_sha_z,
                             vsun=vsun, vsha=vsha)

        # select vegetated / bare / dark per band
        for name, vveg, vnoveg, vdark in (
                ("albd", albd, agrd, jnp.ones_like(albd)),
                ("ftid", ftid, jnp.zeros_like(ftid), jnp.zeros_like(ftid)),
                ("ftdd", ftdd, jnp.ones_like(ftdd), jnp.zeros_like(ftdd)),
                ("fabd", fabd, jnp.zeros_like(fabd), jnp.zeros_like(fabd)),
                ("fabd_sun", fabd_sun, jnp.zeros_like(fabd), jnp.zeros_like(fabd)),
                ("fabd_sha", fabd_sha, jnp.zeros_like(fabd), jnp.zeros_like(fabd)),
                ("albi", albi, agri, jnp.ones_like(albi)),
                ("ftii", ftii, jnp.ones_like(ftii), jnp.zeros_like(ftii)),
                ("fabi", fabi, jnp.zeros_like(fabi), jnp.zeros_like(fabi)),
                ("fabi_sun", fabi_sun, jnp.zeros_like(fabi), jnp.zeros_like(fabi)),
                ("fabi_sha", fabi_sha, jnp.zeros_like(fabi), jnp.zeros_like(fabi))):
            outs[name].append(jnp.where(veg, vveg,
                                        jnp.where(noveg, vnoveg, vdark)))

    stacked = {k: jnp.stack(v, axis=-1) for k, v in outs.items()}

    # per-layer arrays only updated in the vegetated case
    zcan = jnp.zeros((coszen.shape[0], c.NLEVCAN), dtype=coszen.dtype)
    fsun_z = jnp.where(veg[:, None], fsun_z0[:, None], zcan)
    fabd_sun_z = jnp.where(veg[:, None], per_layer["fabd_sun_z"][:, None], zcan)
    fabd_sha_z = jnp.where(veg[:, None], per_layer["fabd_sha_z"][:, None], zcan)
    fabi_sun_z = jnp.where(veg[:, None], per_layer["fabi_sun_z"][:, None], zcan)
    fabi_sha_z = jnp.where(veg[:, None], per_layer["fabi_sha_z"][:, None], zcan)
    vsun = jnp.where(veg, per_layer["vsun"], vcmaxcintsun)
    vsha = jnp.where(veg, per_layer["vsha"], vcmaxcintsha)

    return TwoStreamOut(
        stacked["albd"], stacked["ftid"], stacked["ftdd"], stacked["fabd"],
        stacked["fabd_sun"], stacked["fabd_sha"], stacked["albi"],
        stacked["ftii"], stacked["fabi"], stacked["fabi_sun"],
        stacked["fabi_sha"], fsun_z, fabd_sun_z, fabd_sha_z, fabi_sun_z,
        fabi_sha_z, vsun, vsha)
