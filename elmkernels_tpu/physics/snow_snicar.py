"""SNICAR-AD snow albedo: 5-band spectral Delta-Eddington adding-doubling
radiative transfer with aerosol (BC/OC/dust) effects — batched over columns.

TPU-native rebuild of
``/root/reference/src/physics/snow_snicar_impl.hh:5-773`` (from ELM's
SnowSNICARMod.F90, subroutine SNICAR_AD_RT).

Batched formulation: the adding-doubling recursion over snow layers is a
*static* unroll over all NLEVSNO layers.  Layers above the per-column top
active layer are treated as identity layers (transmission 1, reflection 0),
which leaves every interface quantity unchanged through them — so evaluating
the surface albedo / interface fluxes at interface 0 is exactly equivalent
to the reference's evaluation at ``snl_top``, with no per-column dynamic
indexing.  Inactive-layer absorbed flux is identically zero.

The scratch buffers the reference carries across calls (flx_abs_lcl etc.)
are zero-initialized fresh values here; entries the reference leaves stale
are physically meaningless and are zero in both the fixtures (generated
with zero-initialized scratch) and this implementation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.math_utils import (safe_div, take_layer)

# detail:: constants (snow_snicar.h:24-40)
MIN_SNW = 1.0e-30        # minimum snow mass for RT calculation [kg/m^2]
IDX_BC_NCLRDS_MAX = 9
IDX_BCINT_ICERDS_MAX = 7
IDX_MIE_SNW_MX = 1471
SNW_RDS_MAX_TBL = 1500
SNW_RDS_MIN_TBL = 30

_TRMIN = 0.001
_PUNY = 1.0e-11
_ARGMAX = 10.0

# 8-point Gaussian angles/weights for diffuse integration
# (snow_snicar_impl.hh:349-352)
_DIFGAUSPT = (0.9894009, 0.9445750, 0.8656312, 0.7554044,
              0.6178762, 0.4580168, 0.2816036, 0.0950125)
_DIFGAUSWT = (0.0271525, 0.0622535, 0.0951585, 0.1246290,
              0.1495960, 0.1691565, 0.1826034, 0.1894506)

# 5-band incident flux weights (snow_albedo_radiation_factor,
# snow_snicar_impl.hh:709-722)
_FLX_WGT_DRC = (1.0, 0.49352158521175, 0.18099494230665, 0.12094898498813,
                0.20453448749347)
_FLX_WGT_DFS = (1.0, 0.58581507618433, 0.20156903770812, 0.10917889346386,
                0.10343699264369)


class SnicarTables(NamedTuple):
    """Snow/aerosol optics lookup tables (reference ``SnicarData``,
    ``snicar_data.h:28-84``), read from snicar_optics_5bnd*.nc or the
    SnowOptics text fixture."""
    ss_alb_oc1: jnp.ndarray        # [5]
    asm_prm_oc1: jnp.ndarray
    ext_cff_mss_oc1: jnp.ndarray
    ss_alb_oc2: jnp.ndarray
    asm_prm_oc2: jnp.ndarray
    ext_cff_mss_oc2: jnp.ndarray
    ss_alb_dst1: jnp.ndarray
    asm_prm_dst1: jnp.ndarray
    ext_cff_mss_dst1: jnp.ndarray
    ss_alb_dst2: jnp.ndarray
    asm_prm_dst2: jnp.ndarray
    ext_cff_mss_dst2: jnp.ndarray
    ss_alb_dst3: jnp.ndarray
    asm_prm_dst3: jnp.ndarray
    ext_cff_mss_dst3: jnp.ndarray
    ss_alb_dst4: jnp.ndarray
    asm_prm_dst4: jnp.ndarray
    ext_cff_mss_dst4: jnp.ndarray
    ss_alb_snw_drc: jnp.ndarray    # [5, 1471]
    asm_prm_snw_drc: jnp.ndarray
    ext_cff_mss_snw_drc: jnp.ndarray
    ss_alb_snw_dfs: jnp.ndarray
    asm_prm_snw_dfs: jnp.ndarray
    ext_cff_mss_snw_dfs: jnp.ndarray
    ss_alb_bc1: jnp.ndarray        # [10, 5]
    asm_prm_bc1: jnp.ndarray
    ext_cff_mss_bc1: jnp.ndarray
    ss_alb_bc2: jnp.ndarray
    asm_prm_bc2: jnp.ndarray
    ext_cff_mss_bc2: jnp.ndarray
    bcenh: jnp.ndarray             # [8, 10, 5]


class SnicarOut(NamedTuple):
    albout: jnp.ndarray   # [ncol, numrad]   (albsnd or albsni)
    flx_abs: jnp.ndarray  # [ncol, NLEVSNO+1, numrad] layer absorption factors


def _snicar_core(band_id_b, is_drc_b, snw_ss_b, snw_asm_b, snw_ext_b,
                 coszen, h2osno, snl, h2osoi_liq, h2osoi_ice, snw_rds,
                 albsoi, mss_cnc_aer, tables: SnicarTables):
    """Band-generic SNICAR-AD sweep.

    The leading axis ``B`` of the band-carrying arrays is arbitrary: the
    single-flag entry point uses B = 5 spectral bands, and
    :func:`snicar_ad_rt_both` stacks the direct and diffuse sweeps into
    B = 10 so the whole solve (table mixing, delta transform, the layer
    recursions) runs once.  ``band_id_b`` maps each row to its spectral
    band (0..4); ``is_drc_b`` marks direct-incident rows.

    Returns (albout_lcl [B, ncol], flx_abs_lcl [B, ncol, nsno+1],
    mu_not, snw_rds_lcl, snl_top, active).
    """
    nsno = c.NLEVSNO
    nbnd = c.NUMRAD_SNW
    B = band_id_b.shape[0]
    ncol = coszen.shape[0]
    dtype = coszen.dtype

    active = (coszen > 0.0) & (h2osno > MIN_SNW)

    # ---- init_timestep (impl:7-103) ----------------------------------------
    nosnl = snl == 0
    snl_lcl = jnp.where(nosnl, 1, snl)
    snl_top = nsno - snl_lcl  # [ncol] index of top active snow layer

    lev = jnp.arange(nsno)
    bot = lev == nsno - 1
    ice_lcl = jnp.where(nosnl[:, None],
                        jnp.where(bot[None, :], h2osno[:, None], 0.0),
                        h2osoi_ice[:, :nsno])
    liq_lcl = jnp.where(nosnl[:, None], 0.0, h2osoi_liq[:, :nsno])
    snw_rds_lcl = jnp.where(
        nosnl[:, None], jnp.int32(round(c.SNW_RDS_MIN)),
        jnp.rint(snw_rds).astype(jnp.int32))

    mu_not = jnp.maximum(coszen, 0.01)

    is_lyr_active = lev[None, :] >= snl_top[:, None]  # [ncol, nsno]

    # ---- snow_aerosol_mie_params (impl:105-309) ----------------------------
    # BC lookup indices (integer-division semantics of the reference)
    r = snw_rds_lcl
    idx_icerds = jnp.where(
        r < 125, r // 50 - 1,
        jnp.where(r < 175, 1, r // 250 + 1))
    idx_icerds = jnp.clip(idx_icerds, 0, IDX_BCINT_ICERDS_MAX)
    idx_bc_nclrds = 1  # round(100nm/50)-1, static for both int/ext BC

    rds_idx = jnp.clip(r - SNW_RDS_MIN_TBL, 0, IDX_MIE_SNW_MX - 1)

    # ---- band-vectorized Mie mixing: all arrays [B, nsno, ncol] -----------
    # (the reference loops bands serially; vectorizing keeps the traced
    # graph 5x (10x merged) smaller and fuses better on the VPU)
    # Layout: the column axis is kept MINOR-most throughout this kernel.
    # TPU tiles the two minor dims as (8 sublanes, 128 lanes); with the
    # 5-element layer axis minor a [B, ncol, nsno] elementwise op would
    # occupy 5/128 lanes, so every VPU op in the sweep is laid out as
    # [B, nsno, ncol] (full 128-lane occupancy, 5/8 sublanes).
    L_snw = (ice_lcl + liq_lcl).T  # [nsno, ncol]
    # one fused row-gather over the 1471-bin radius axis for all three
    # Mie tables (3 scalar gathers -> 1 contiguous-row gather)
    mie = jnp.stack([snw_ss_b, snw_asm_b, snw_ext_b])   # [3, B, nbins]
    mie_rows = mie.reshape(3 * B, -1).T                 # [nbins, 3*B]
    rows = jnp.take(mie_rows, rds_idx.T, axis=0)        # [nsno, ncol, 3*B]
    rows = jnp.moveaxis(rows, -1, 0).reshape(3, B, nsno, ncol)
    ss_snw, asm_snw, ext_snw = rows[0], rows[1], rows[2]

    # aerosols ignored in bands 4,5 (impl:146-152)
    band_has_aer = (band_id_b < 3)[:, None, None, None]
    mss_t = jnp.transpose(mss_cnc_aer, (2, 1, 0))       # [8, nsno, ncol]
    mss_b = jnp.where(band_has_aer, mss_t[None], 0.0)   # [B, 8, nsno, ncol]
    # species optical properties, stacked [nbnd, nspecies] then expanded to
    # the B rows (+per-layer enh factor folded into within-ice BC
    # extinction)
    # idx_bc_nclrds is static: pre-slice bcenh to an [8, nbnd] table and
    # contract with a one-hot over the 8 icerds bins (a scalar 3-D gather
    # serializes on TPU; this is a plain VPU select+reduce)
    bcenh_t = tables.bcenh[:, idx_bc_nclrds, :]       # [8, nbnd]
    oh_ice = (idx_icerds.T[None]
              == jnp.arange(bcenh_t.shape[0],
                            dtype=idx_icerds.dtype)[:, None, None]
              )                                       # [8, nsno, ncol]
    bcenh_b = bcenh_t[:, band_id_b]                   # [8, B]
    enh = jnp.sum(jnp.where(oh_ice[:, None], bcenh_b[:, :, None, None],
                            0.0), axis=0)             # [B, nsno, ncol]
    ss_aer = jnp.stack([
        jnp.broadcast_to(tables.ss_alb_bc1[idx_bc_nclrds], (nbnd,)),
        tables.ss_alb_bc2[idx_bc_nclrds], tables.ss_alb_oc1,
        tables.ss_alb_oc2, tables.ss_alb_dst1, tables.ss_alb_dst2,
        tables.ss_alb_dst3, tables.ss_alb_dst4], axis=1)[band_id_b]
    asm_aer = jnp.stack([
        tables.asm_prm_bc1[idx_bc_nclrds], tables.asm_prm_bc2[idx_bc_nclrds],
        tables.asm_prm_oc1, tables.asm_prm_oc2, tables.asm_prm_dst1,
        tables.asm_prm_dst2, tables.asm_prm_dst3, tables.asm_prm_dst4],
        axis=1)[band_id_b]
    ext_aer_scalar = jnp.stack([
        jnp.zeros((nbnd,), tables.ext_cff_mss_bc2.dtype),
        tables.ext_cff_mss_bc2[idx_bc_nclrds],
        tables.ext_cff_mss_oc1, tables.ext_cff_mss_oc2,
        tables.ext_cff_mss_dst1, tables.ext_cff_mss_dst2,
        tables.ext_cff_mss_dst3, tables.ext_cff_mss_dst4],
        axis=1)[band_id_b]

    tau_snw = L_snw[None] * ext_snw
    # per-species optical depths: [B, 8, nsno, ncol] (species axis kept
    # away from the minor tile dims)
    ext_all = jnp.broadcast_to(
        ext_aer_scalar[:, :, None, None],
        (B, c.SNO_NBR_AER) + L_snw.shape)
    # within-ice BC (species 0) carries the per-layer enhancement factor
    ext_bc1 = (tables.ext_cff_mss_bc1[idx_bc_nclrds][band_id_b][:, None,
                                                               None]
               * enh)  # [B, nsno, ncol]
    ext_all = ext_all.at[:, 0].set(ext_bc1)
    tau_aer = L_snw[None, None] * mss_b * ext_all
    tau_sum = jnp.sum(tau_aer, axis=1)
    omega_sum = jnp.sum(tau_aer * ss_aer[:, :, None, None], axis=1)
    g_sum = jnp.sum(tau_aer * ss_aer[:, :, None, None]
                    * asm_aer[:, :, None, None], axis=1)

    tau = tau_sum + tau_snw
    omega = safe_div(omega_sum + ss_snw * tau_snw, tau, tau > 0.0)
    g = safe_div(g_sum + asm_snw * ss_snw * tau_snw, tau * omega,
                 (tau > 0.0) & (omega > 0.0))

    # Delta transformation (impl:293-298); arrays [B, nsno, ncol]
    g_star = g / (1.0 + g)
    omega_star = ((1.0 - g ** 2) * omega) / (1.0 - omega * g ** 2)
    tau_star = (1.0 - omega * g ** 2) * tau

    # ---- snow_radiative_transfer_solver (impl:311-669) ---------------------
    # fully band-vectorized: every layer/interface quantity carries a
    # leading band axis [B, ncol]; the layer recursions stay as short
    # static unrolls (the batch axes give the parallelism)
    exp_min = jnp.exp(-_ARGMAX)

    ts_b, ws_b, gs_b = tau_star, omega_star, g_star  # [B, nsno, ncol]

    # --- per-layer Delta-Eddington apparent optical properties ---
    lm = jnp.sqrt(jnp.maximum(
        3.0 * (1.0 - ws_b) * (1.0 - ws_b * gs_b), 0.0))
    lm_s = jnp.where(lm > 0.0, lm, 1.0)
    ue = 1.5 * (1.0 - ws_b * gs_b) / lm_s
    extins = jnp.maximum(exp_min, jnp.exp(-lm * ts_b))
    ne = ((ue + 1.0) ** 2 / extins) - ((ue - 1.0) ** 2 * extins)
    rdif_de = (ue ** 2 - 1.0) * (1.0 / extins - extins) / ne
    tdif_de = 4.0 * ue / ne
    mu0 = mu_not[None, None, :]
    trnlay_c = jnp.maximum(exp_min, jnp.exp(-ts_b / mu0))

    denom0 = 1.0 - lm ** 2 * mu0 ** 2
    alp0 = 0.75 * ws_b * mu0 * (1.0 + gs_b * (1.0 - ws_b)) / denom0
    gam0 = 0.5 * ws_b * (1.0 + 3.0 * gs_b * (1.0 - ws_b) * mu0 ** 2) / denom0
    apg0 = alp0 + gam0
    amg0 = alp0 - gam0
    rdir_c = apg0 * rdif_de + amg0 * (tdif_de * trnlay_c - 1.0)
    tdir_c = apg0 * tdif_de + (amg0 * rdif_de - apg0 + 1.0) * trnlay_c

    # Gaussian angular re-integration of rdif/tdif (impl:456-484).
    # Rather than materializing [B, nsno, ncol, 8] quadrature tensors
    # (~26 MB each in emulated f64 — the former per-step hotspot), the
    # 8-point sum is unrolled as a straight-line accumulation over
    # scalar angles: with rdr = apg*rdif_de + amg*tdif_de*trn - amg and
    # tdr = apg*tdif_de + amg*rdif_de*trn - apg*trn + trn, the
    # μw-weighted sums distribute onto five accumulators
    #   S_apg = Σ μw·apg    S_amg = Σ μw·amg
    #   T_apg = Σ μw·apg·trn  T_amg = Σ μw·amg·trn  T_0 = Σ μw·trn
    # so every temporary stays [B, nsno, ncol] and XLA fuses the whole
    # quadrature into one kernel (same arithmetic per angle; only the
    # final summation is re-associated, O(1e-16) relative).
    alp_f = 0.75 * ws_b * (1.0 + gs_b * (1.0 - ws_b))   # alp = alp_f·μ/D
    gam_f1 = 0.5 * ws_b                                  # gam = (gam_f1
    gam_f2 = 1.5 * ws_b * gs_b * (1.0 - ws_b)            #  + gam_f2·μ²)/D
    lm2 = lm * lm
    s_apg = s_amg = t_apg = t_amg = t_0 = 0.0
    swt = 0.0
    for mu_g, wt_g in zip(_DIFGAUSPT, _DIFGAUSWT):
        muw = mu_g * wt_g
        swt += muw
        trn = jnp.maximum(exp_min, jnp.exp(-ts_b / mu_g))
        inv_d = 1.0 / (1.0 - lm2 * (mu_g * mu_g))
        alp = alp_f * mu_g * inv_d
        gam = (gam_f1 + gam_f2 * (mu_g * mu_g)) * inv_d
        apg = alp + gam
        amg = alp - gam
        s_apg = s_apg + muw * apg
        s_amg = s_amg + muw * amg
        t_apg = t_apg + muw * (apg * trn)
        t_amg = t_amg + muw * (amg * trn)
        t_0 = t_0 + muw * trn
    rdif_c = (rdif_de * s_apg + tdif_de * t_amg - s_amg) / swt
    tdif_c = (tdif_de * s_apg + rdif_de * t_amg - t_apg + t_0) / swt

    # --- top-down interface recursion (impl:403-510), scanned over layers.
    # Same per-layer arithmetic as a static unroll (the recursion is
    # sequential either way); ys stack the per-layer apparent properties
    # and the interface quantities the later stages need.
    one = jnp.ones((B, ncol), dtype)
    zero = jnp.zeros((B, ncol), dtype)
    act_l = jnp.broadcast_to(is_lyr_active.T[:, None, :],
                             (nsno, B, ncol))  # [nsno, B, ncol]

    def topdown(carry, x):
        trndir_i, trntdr_i, trndif_i, rdndif_i = carry
        act, rdir_ci, tdir_ci, trnlay_ci, rdif_ci, tdif_ci = x
        compute = act & (trntdr_i > _TRMIN)

        def sel(comp_val, ident_val):
            return jnp.where(compute, comp_val,
                             jnp.where(act, zero, ident_val))
        rdir = sel(rdir_ci, zero)
        tdir = sel(tdir_ci, one)
        trnlay = sel(trnlay_ci, one)
        rdif_a = sel(rdif_ci, zero)
        tdif_a = sel(tdif_ci, one)
        # rdif_b/tdif_b alias rdif_a/tdif_a (isotropic layers)

        refkm1 = 1.0 / (1.0 - rdndif_i * rdif_a)
        tdrrdir = trndir_i * rdir
        tdndif = trntdr_i - trndir_i
        nxt = (trndir_i * trnlay,
               trndir_i * tdir
               + (tdndif + tdrrdir * rdndif_i) * refkm1 * tdif_a,
               trndif_i * refkm1 * tdif_a,
               rdif_a + tdif_a * rdndif_i * refkm1 * tdif_a)
        ys = (rdir, tdir, trnlay, rdif_a, tdif_a,
              trndir_i, trntdr_i, trndif_i, rdndif_i)
        return (nxt[0], nxt[1], nxt[2], nxt[3]), ys

    xs = tuple(jnp.moveaxis(a, 1, 0)
               for a in (rdir_c, tdir_c, trnlay_c, rdif_c, tdif_c))
    (trndir_n, trntdr_n, trndif_n, rdndif_n), ys = jax.lax.scan(
        topdown, (one, one, one, zero), (act_l,) + xs)
    (rdir_l, tdir_l, trnlay_l, rdif_a_l, tdif_a_l,
     trndir_t, trntdr_t, trndif_t, rdndif_t) = ys  # [nsno, B, ncol] each
    # interface lists 0..nsno: carry-before-update per layer + final carry
    trndir = jnp.concatenate([trndir_t, trndir_n[None]], axis=0)
    trntdr = jnp.concatenate([trntdr_t, trntdr_n[None]], axis=0)
    trndif = jnp.concatenate([trndif_t, trndif_n[None]], axis=0)
    rdndif = jnp.concatenate([rdndif_t, rdndif_n[None]], axis=0)

    # --- bottom-up reflectivity recursion (impl:526-544), reverse scan ---
    # underlying ground albedo: vis for band 0, nir for bands 1-4
    band_is_vis = (band_id_b == 0)[:, None]
    soil_alb = jnp.where(band_is_vis, albsoi[None, :, 0], albsoi[None, :, 1])

    def bottomup(carry, row):
        rup_dir_p1, rup_dif_p1 = carry
        rdir, tdir, trnlay, rdif_a, tdif_a = row
        refkp1 = 1.0 / (1.0 - rdif_a * rup_dif_p1)
        rup_dir = (rdir + (trnlay * rup_dir_p1
                           + (tdir - trnlay) * rup_dif_p1)
                   * refkp1 * tdif_a)
        rup_dif = rdif_a + tdif_a * rup_dif_p1 * refkp1 * tdif_a
        return (rup_dir, rup_dif), (rup_dir, rup_dif)

    _, (rupdir_t, rupdif_t) = jax.lax.scan(
        bottomup, (soil_alb, soil_alb),
        (rdir_l, tdir_l, trnlay_l, rdif_a_l, tdif_a_l), reverse=True)
    rupdir = jnp.concatenate([rupdir_t, soil_alb[None]], axis=0)
    rupdif = jnp.concatenate([rupdif_t, soil_alb[None]], axis=0)

    # --- net interface fluxes (impl:560-588), vectorized over interfaces.
    # direct rows take the direct-beam flux profile, diffuse rows the
    # diffuse one (the reference's if(flg_slr_in) at impl:578-586)
    is_drc_e = is_drc_b[:, None]
    refk = 1.0 / (1.0 - rdndif * rupdif)
    dfdir = (trndir + (trntdr - trndir) * (1.0 - rupdif) * refk
             - trndir * rupdir * (1.0 - rdndif) * refk)
    dfdir = jnp.where(dfdir < _PUNY, 0.0, dfdir)
    dfdif = trndif * (1.0 - rupdif) * refk
    dfdif = jnp.where(dfdif < _PUNY, 0.0, dfdif)
    dftmp = jnp.where(is_drc_e[None], dfdir, dfdif)  # [nsno+1, B, ncol]

    albout_lcl = jnp.where(is_drc_e, rupdir[0], rupdif[0])  # [B, ncol]

    # --- absorbed flux per layer + ground (impl:611-646) ---
    f_abs = jnp.maximum(dftmp[:-1] - dftmp[1:], 0.0)
    f_btm = jnp.maximum(dftmp[nsno], 0.0)
    flx_abs_lcl = jnp.moveaxis(
        jnp.concatenate([jnp.where(act_l, f_abs, 0.0), f_btm[None]],
                        axis=0), 0, -1)  # [B, ncol, nsno+1]

    return albout_lcl, flx_abs_lcl, mu_not, snw_rds_lcl, snl_top, active


def _radiation_factor(flg_is_direct: bool, albout_lcl, flx_abs_lcl, mu_not,
                      snw_rds_lcl, snl_top, coszen, h2osno, albsoi,
                      active) -> SnicarOut:
    """snow_albedo_radiation_factor (impl:671-771) for one incident flag:
    5-band -> vis/nir weighting, high-SZA near-IR adjustment (direct
    only), and the active/thin-snow/none branch select."""
    nsno = c.NLEVSNO
    dtype = coszen.dtype
    wgt = _FLX_WGT_DRC if flg_is_direct else _FLX_WGT_DFS
    wgt_sum = sum(wgt[1:5])
    wgt_arr = jnp.asarray(wgt)

    alb_vis = albout_lcl[0]
    alb_nir = jnp.einsum("b,bc->c", wgt_arr[1:5], albout_lcl[1:5]) / wgt_sum
    flx_vis = flx_abs_lcl[0]
    flx_nir = jnp.einsum("b,bcl->cl", wgt_arr[1:5],
                         flx_abs_lcl[1:5]) / wgt_sum

    # near-IR direct adjustment for high solar zenith angle (impl:747-760)
    if flg_is_direct:
        mu_75 = 0.2588
        sza_c1 = 0.085730 - 0.630883 * mu_not + 1.303723 * mu_not ** 2
        sza_c0 = 1.467291 - 3.338043 * mu_not + 6.807489 * mu_not ** 2
        rds_top = take_layer(snw_rds_lcl, snl_top).astype(dtype)
        sza_factor = sza_c1 * (jnp.log10(rds_top) - 6.0) + sza_c0
        adjust = (mu_not < mu_75)
        flx_sza_adjust = alb_nir * (sza_factor - 1.0) * wgt_sum
        alb_nir = jnp.where(adjust, alb_nir * sza_factor, alb_nir)
        lev6 = jnp.arange(nsno + 1)
        at_top = lev6[None, :] == snl_top[:, None]
        flx_nir = flx_nir - jnp.where(
            at_top & adjust[:, None], flx_sza_adjust[:, None], 0.0)

    # branch select: active / thin-snow / none (impl:761-769)
    thin = (coszen > 0.0) & (h2osno < MIN_SNW) & (h2osno > 0.0)
    alb_vis = jnp.where(active, alb_vis,
                        jnp.where(thin, albsoi[:, 0], 0.0))
    alb_nir = jnp.where(active, alb_nir,
                        jnp.where(thin, albsoi[:, 1], 0.0))
    albout = jnp.stack([alb_vis, alb_nir], axis=-1)

    flx_abs = jnp.stack([flx_vis, flx_nir], axis=-1)
    flx_abs = jnp.where(active[:, None, None], flx_abs, 0.0)
    return SnicarOut(albout, flx_abs)


def snicar_ad_rt(land: c.LandType, flg_slr_in: int, coszen, h2osno, snl,
                 h2osoi_liq, h2osoi_ice, snw_rds, albsoi, mss_cnc_aer,
                 tables: SnicarTables) -> SnicarOut:
    """One full SNICAR-AD radiative transfer sweep for direct
    (``flg_slr_in=1``) or diffuse (``flg_slr_in=2``) incident radiation.

    Wraps the reference call chain ``init_timestep`` →
    ``snow_aerosol_mie_params`` → ``snow_radiative_transfer_solver`` →
    ``snow_albedo_radiation_factor`` (``snow_snicar_impl.hh:7-771``).

    h2osoi_liq/ice are combined [ncol, NLEVTOT] arrays; snw_rds is
    [ncol, NLEVSNO]; mss_cnc_aer is [ncol, NLEVSNO, SNO_NBR_AER].
    """
    assert flg_slr_in in (1, 2)
    nbnd = c.NUMRAD_SNW
    direct = flg_slr_in == 1
    band_id_b = jnp.arange(nbnd)
    is_drc_b = jnp.full((nbnd,), direct)
    if direct:
        snw_ss, snw_asm, snw_ext = (tables.ss_alb_snw_drc,
                                    tables.asm_prm_snw_drc,
                                    tables.ext_cff_mss_snw_drc)
    else:
        snw_ss, snw_asm, snw_ext = (tables.ss_alb_snw_dfs,
                                    tables.asm_prm_snw_dfs,
                                    tables.ext_cff_mss_snw_dfs)
    albout_lcl, flx_abs_lcl, mu_not, snw_rds_lcl, snl_top, active = \
        _snicar_core(band_id_b, is_drc_b, snw_ss, snw_asm, snw_ext,
                     coszen, h2osno, snl, h2osoi_liq, h2osoi_ice, snw_rds,
                     albsoi, mss_cnc_aer, tables)
    return _radiation_factor(direct, albout_lcl, flx_abs_lcl, mu_not,
                             snw_rds_lcl, snl_top, coszen, h2osno, albsoi,
                             active)


def snicar_ad_rt_both(land: c.LandType, coszen, h2osno, snl, h2osoi_liq,
                      h2osoi_ice, snw_rds, albsoi, mss_cnc_aer,
                      tables: SnicarTables) -> tuple[SnicarOut, SnicarOut]:
    """Direct + diffuse sweeps fused into ONE solve: the 5 direct and 5
    diffuse spectral bands stack into a single 10-row band axis, so the
    Mie mixing, delta transform, and the sequential layer recursions run
    once at double width instead of twice (the reference calls
    SNICAR_AD_RT twice per step, ``albedo_kokkos.cc``).

    Bit-identical to the two single-flag calls: every operation is
    elementwise (or a within-row reduction) over the band axis.
    """
    nbnd = c.NUMRAD_SNW
    band_id_b = jnp.tile(jnp.arange(nbnd), 2)
    is_drc_b = jnp.arange(2 * nbnd) < nbnd
    snw_ss = jnp.concatenate([tables.ss_alb_snw_drc,
                              tables.ss_alb_snw_dfs], axis=0)
    snw_asm = jnp.concatenate([tables.asm_prm_snw_drc,
                               tables.asm_prm_snw_dfs], axis=0)
    snw_ext = jnp.concatenate([tables.ext_cff_mss_snw_drc,
                               tables.ext_cff_mss_snw_dfs], axis=0)
    albout_lcl, flx_abs_lcl, mu_not, snw_rds_lcl, snl_top, active = \
        _snicar_core(band_id_b, is_drc_b, snw_ss, snw_asm, snw_ext,
                     coszen, h2osno, snl, h2osoi_liq, h2osoi_ice, snw_rds,
                     albsoi, mss_cnc_aer, tables)
    drc = _radiation_factor(True, albout_lcl[:nbnd], flx_abs_lcl[:nbnd],
                            mu_not, snw_rds_lcl, snl_top, coszen, h2osno,
                            albsoi, active)
    dfs = _radiation_factor(False, albout_lcl[nbnd:], flx_abs_lcl[nbnd:],
                            mu_not, snw_rds_lcl, snl_top, coszen, h2osno,
                            albsoi, active)
    return drc, dfs
