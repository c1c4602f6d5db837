"""Crank-Nicolson implicit snow/surface-water/soil temperature solve and
post-solve freeze/thaw phase change — batched over columns.

TPU-native rebuild of the reference's soil-temperature chain
(``/root/reference/src/physics/soil_temperature_impl.hh``,
``soil_temp_lhs_impl.hh``, ``soil_temp_rhs_impl.hh``,
``pentadiagonal_solver_impl.hh``, ``phase_change_impl.hh``; orchestration in
``driver/kokkos/soil_temperature_kokkos.cc:6-278``).

The N = NLEVSNO+1+NLEVGRND = 21 pentadiagonal system (snow rows, one
standing-surface-water row, soil rows) is solved with the Askar & Karawia
PDMA recurrence unrolled over the 21 rows, batched over columns.  Rows
above the per-column top active layer are *identity rows* (diag 1, rhs 0),
which makes the uniform recurrence exactly reproduce the reference's
variable-start solve with zero per-column control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.math_utils import (safe_div, take_layer)

CNFAC = 0.5   # Crank-Nicolson factor (detail::cnfac, soil_temperature.h)
CAPR = 0.34   # tuning factor, first-layer T -> surface T
NBAND = c.NBAND
NSYS = c.NLEVSNO + 1 + c.NLEVGRND  # 21 rows: snow + ssw + soil


def calc_lwrad_emit(emg, temp):
    """Reference: ``soil_temperature_impl.hh:78-82``."""
    return emg * c.STEBOL * temp ** 4.0


def calc_dlwrad_emit(emg, t_grnd):
    """Reference: ``soil_temperature_impl.hh:85-89``."""
    return 4.0 * emg * c.STEBOL * t_grnd ** 3.0


def check_absorbed_solar(frac_sno_eff, sabg_snow, sabg_soil):
    """Reference: ``soil_temperature_impl.hh:36-40``."""
    return frac_sno_eff * sabg_snow + (1.0 - frac_sno_eff) * sabg_soil


def calc_surface_heat_flux(frac_veg_nosno, dlrad, emg, forc_lwrad, htvp,
                           solar_abg, temp, eflx_sh, qflx_ev):
    """Reference: ``soil_temperature_impl.hh:15-28``."""
    return (solar_abg + dlrad + (1.0 - frac_veg_nosno) * emg * forc_lwrad
            - calc_lwrad_emit(emg, temp) - (eflx_sh + qflx_ev * htvp))


def calc_dhsdT(cgrnd, emg, t_grnd):
    """Reference: ``soil_temperature_impl.hh:30-34``."""
    return -cgrnd - calc_dlwrad_emit(emg, t_grnd)


def calc_diffusive_heat_flux(snl, tk, t_soisno, z):
    """Interface diffusive heat flux fn [ncol, NLEVTOT]; fn(i) between
    cells i and i+1; bottom flux hardwired 0.

    Reference: ``soil_temperature_impl.hh:47-75``.
    """
    lev = jnp.arange(c.NLEVTOT - 1)
    fn_inner = tk[:, :-1] * (t_soisno[:, 1:] - t_soisno[:, :-1]) / (
        z[:, 1:] - z[:, :-1])
    active = lev[None, :] >= (c.NLEVSNO - snl)[:, None]
    fn_inner = jnp.where(active, fn_inner, 0.0)
    return jnp.concatenate([fn_inner, jnp.zeros_like(fn_inner[:, :1])],
                           axis=1)


def calc_heat_flux_matrix_factor(snl, dtime, cv, dz, z, zi):
    """Matrix factor fact = dt/cv (with surface-layer adjustment at the top
    active layer) [ncol, NLEVTOT].

    Reference: ``soil_temperature_impl.hh:92-120``.
    """
    lev = jnp.arange(c.NLEVTOT)
    top = (c.NLEVSNO - snl)[:, None]
    at_top = lev[None, :] == top
    below = lev[None, :] > top

    cv_safe = jnp.where(cv != 0.0, cv, 1.0)
    base = dtime / cv_safe
    z_tp1 = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=1)  # z(i+1), padded
    top_fact = base * dz / (0.5 * (z - zi[:, :c.NLEVTOT]
                                   + CAPR * (z_tp1 - zi[:, :c.NLEVTOT])))
    return jnp.where(at_top, top_fact, jnp.where(below, base, 0.0))


def _assemble_system(snl, dtime, dhsdT, frac_sno_eff, frac_h2osfc,
                     dz_h2osfc, c_h2osfc, tk_h2osfc, z, fact, tk,
                     hs_top_snow, hs_soil, hs_h2osfc, t_soisno, t_h2osfc,
                     fn, sabg_lyr):
    """Build the banded LHS [ncol, 21, 5] and RHS [ncol, 21].

    Bands: 0 = 2nd superdiag, 1 = 1st superdiag, 2 = diag, 3 = 1st subdiag,
    4 = 2nd subdiag (reference: ``soil_temp_lhs_impl.hh:2-94`` layout).
    Inactive rows become identity rows so the PDMA recurrence can start at
    row 0 for every column.
    """
    ncol = snl.shape[0]
    dtype = z.dtype
    nsno = c.NLEVSNO
    top = nsno - snl  # [ncol] top active row

    lhs = jnp.zeros((ncol, NSYS, NBAND), dtype)
    rhs = jnp.zeros((ncol, NSYS), dtype)

    # ---- snow rows (0..nsno-1) --------------------------------------------
    # reference: get_matrix_snow (soil_temp_lhs_impl.hh:158-196),
    # get_rhs_snow (soil_temp_rhs_impl.hh:77-108)
    lev_s = jnp.arange(nsno)
    has_snow = (snl > 0)[:, None]
    at_top_s = (lev_s[None, :] == top[:, None]) & has_snow
    below_top_s = (lev_s[None, :] > top[:, None]) & has_snow

    z_sno = z[:, :nsno]
    z_p1 = z[:, 1:nsno + 1]
    z_m1 = jnp.concatenate([z[:, :1], z[:, :nsno - 1]], axis=1)
    tk_s = tk[:, :nsno]
    tk_m1 = jnp.concatenate([tk[:, :1], tk[:, :nsno - 1]], axis=1)
    fact_s = fact[:, :nsno]
    dzp = z_p1 - z_sno
    dzm = z_sno - z_m1
    dzp_s = jnp.where(dzp != 0.0, dzp, 1.0)
    dzm_s = jnp.where(dzm != 0.0, dzm, 1.0)

    diag_top = (1.0 + (1.0 - CNFAC) * fact_s * tk_s / dzp_s
                - fact_s * dhsdT[:, None])
    sup_top = -(1.0 - CNFAC) * fact_s * tk_s / dzp_s
    diag_mid = (1.0 + (1.0 - CNFAC) * fact_s
                * (tk_s / dzp_s + tk_m1 / dzm_s))
    sub_mid = -(1.0 - CNFAC) * fact_s * tk_m1 / dzm_s
    sup_mid = -(1.0 - CNFAC) * fact_s * tk_s / dzp_s

    multi = (snl > 1)[:, None]
    not_bottom = lev_s[None, :] != nsno - 1
    snow_diag = jnp.where(at_top_s, diag_top,
                          jnp.where(below_top_s, diag_mid, 0.0))
    snow_sup = jnp.where(at_top_s & multi, sup_top,
                         jnp.where(below_top_s & not_bottom, sup_mid, 0.0))
    snow_sub = jnp.where(below_top_s, sub_mid, 0.0)

    lhs = lhs.at[:, :nsno, 2].set(snow_diag)
    lhs = lhs.at[:, :nsno, 1].set(snow_sup)
    lhs = lhs.at[:, :nsno, 3].set(snow_sub)

    # snow-soil coupling: bottom snow row, band 0 (2nd superdiag skips the
    # ssw row to reach the top soil row)
    dz_ss = z[:, nsno] - z[:, nsno - 1]
    snow_soil = jnp.where(
        snl > 0,
        -(1.0 - CNFAC) * fact[:, nsno - 1] * tk[:, nsno - 1] / dz_ss, 0.0)
    lhs = lhs.at[:, nsno - 1, 0].set(snow_soil)

    # snow RHS
    t_s = t_soisno[:, :nsno]
    fn_s = fn[:, :nsno]
    fn_m1 = jnp.concatenate([fn[:, :1], fn[:, :nsno - 1]], axis=1)
    rt_top = t_s + fact_s * (hs_top_snow[:, None]
                             - dhsdT[:, None] * t_s + CNFAC * fn_s)
    rt_mid = (t_s + CNFAC * fact_s * (fn_s - fn_m1)
              + fact_s * sabg_lyr[:, :nsno])
    rhs = rhs.at[:, :nsno].set(
        jnp.where(at_top_s, rt_top, jnp.where(below_top_s, rt_mid, 0.0)))

    # ---- standing surface water row (nsno) --------------------------------
    # reference: get_matrix_ssw / get_matrix_ssw_soil
    # (soil_temp_lhs_impl.hh:312-354), get_rhs_ssw (rhs_impl:112-134)
    c_sfc = jnp.where(c_h2osfc != 0.0, c_h2osfc, 1.0)
    denom_sfc = 0.5 * dz_h2osfc + z[:, nsno]
    ssw_diag = (1.0 + (1.0 - CNFAC) * (dtime / c_sfc) * tk_h2osfc / denom_sfc
                - (dtime / c_sfc) * dhsdT)
    ssw_sup = -(1.0 - CNFAC) * (dtime / c_sfc) * tk_h2osfc / denom_sfc
    lhs = lhs.at[:, nsno, 2].set(ssw_diag)
    lhs = lhs.at[:, nsno, 1].set(ssw_sup)

    fn_h2osfc = tk_h2osfc * (t_soisno[:, nsno] - t_h2osfc) / denom_sfc
    rhs = rhs.at[:, nsno].set(
        t_h2osfc + (dtime / c_sfc) * (hs_h2osfc - dhsdT * t_h2osfc
                                      + CNFAC * fn_h2osfc))

    # ---- soil rows (nsno+1 .. NSYS-1) -------------------------------------
    # reference: get_matrix_soil / get_matrix_soil_snow / get_matrix_soil_ssw
    # (soil_temp_lhs_impl.hh:222-379), get_rhs_soil (rhs_impl:136-176)
    ngr = c.NLEVGRND
    off = jnp.arange(ngr) + nsno          # combined index of soil layers
    z_g = z[:, nsno:]
    z_gp1 = jnp.concatenate([z[:, nsno + 1:], z[:, -1:]], axis=1)
    z_gm1 = z[:, nsno - 1:nsno + ngr - 1]
    tk_g = tk[:, nsno:]
    tk_gm1 = tk[:, nsno - 1:nsno + ngr - 1]
    fact_g = fact[:, nsno:]
    dzp_g = jnp.where(z_gp1 - z_g != 0.0, z_gp1 - z_g, 1.0)
    dzm_g = z_g - z_gm1

    lev_g = jnp.arange(ngr)
    first = lev_g[None, :] == 0
    last = lev_g[None, :] == ngr - 1
    interior = ~first & ~last

    # first soil row
    no_sno = (snl == 0)
    d_first_nosno = (1.0 + (1.0 - CNFAC) * fact_g[:, 0] * tk_g[:, 0]
                     / dzp_g[:, 0] - fact_g[:, 0] * dhsdT)
    d_first_sno = (1.0 + (1.0 - CNFAC) * fact_g[:, 0]
                   * (tk_g[:, 0] / dzp_g[:, 0]
                      + frac_sno_eff * tk_gm1[:, 0] / dzm_g[:, 0])
                   - (1.0 - frac_sno_eff) * fact_g[:, 0] * dhsdT)
    d_first = jnp.where(no_sno, d_first_nosno, d_first_sno)
    # h2osfc diagonal correction
    dzm_sfc = 0.5 * dz_h2osfc + z[:, nsno]
    d_first = d_first + jnp.where(
        frac_h2osfc != 0.0,
        frac_h2osfc * ((1.0 - CNFAC) * fact_g[:, 0] * tk_h2osfc / dzm_sfc
                       + fact_g[:, 0] * dhsdT), 0.0)
    sup_first = -(1.0 - CNFAC) * fact_g[:, 0] * tk_g[:, 0] / dzp_g[:, 0]

    d_int = (1.0 + (1.0 - CNFAC) * fact_g
             * (tk_g / dzp_g + tk_gm1 / dzm_g))
    sub_int = -(1.0 - CNFAC) * fact_g * tk_gm1 / dzm_g
    sup_int = -(1.0 - CNFAC) * fact_g * tk_g / dzp_g
    d_last = 1.0 + (1.0 - CNFAC) * fact_g * tk_gm1 / dzm_g

    soil_diag = jnp.where(first, d_first[:, None],
                          jnp.where(last, d_last, d_int))
    soil_sup = jnp.where(first, sup_first[:, None],
                         jnp.where(last, 0.0, sup_int))
    soil_sub = jnp.where(first, 0.0, sub_int)

    lhs = lhs.at[:, nsno + 1:, 2].set(soil_diag)
    lhs = lhs.at[:, nsno + 1:, 1].set(soil_sup)
    lhs = lhs.at[:, nsno + 1:, 3].set(soil_sub)

    # soil-snow (band 4 of first soil row) and soil-ssw (band 3)
    soil_snow = jnp.where(
        no_sno, 0.0,
        -frac_sno_eff * (1.0 - CNFAC) * fact[:, nsno] * tk[:, nsno - 1]
        / dzm_g[:, 0])
    lhs = lhs.at[:, nsno + 1, 4].set(soil_snow)
    soil_ssw = jnp.where(
        frac_h2osfc != 0.0,
        -frac_h2osfc * (1.0 - CNFAC) * fact[:, nsno] * tk_h2osfc / dzm_sfc,
        0.0)
    lhs = lhs.at[:, nsno + 1, 3].set(soil_ssw)

    # soil RHS
    t_g = t_soisno[:, nsno:]
    fn_g = fn[:, nsno:]
    fn_gm1 = fn[:, nsno - 1:nsno + ngr - 1]
    rt_first_nosno = (t_g[:, 0] + fact_g[:, 0]
                      * (hs_top_snow - dhsdT * t_g[:, 0]
                         + CNFAC * fn_g[:, 0]))
    rt_first_sno = (t_g[:, 0] + fact_g[:, 0]
                    * ((1.0 - frac_sno_eff)
                       * (hs_soil - dhsdT * t_g[:, 0])
                       + CNFAC * (fn_g[:, 0]
                                  - frac_sno_eff * fn_gm1[:, 0]))
                    + frac_sno_eff * fact_g[:, 0] * sabg_lyr[:, nsno])
    rt_first = jnp.where(no_sno, rt_first_nosno, rt_first_sno)
    rt_int = t_g + CNFAC * fact_g * (fn_g - fn_gm1)
    rt_last = t_g - CNFAC * fact_g * fn_gm1 + fact_g * fn_g
    rt_soil = jnp.where(first, rt_first[:, None],
                        jnp.where(last, rt_last, rt_int))
    rhs = rhs.at[:, nsno + 1:].set(rt_soil)

    # ---- identity rows above the top active layer -------------------------
    rows = jnp.arange(NSYS)
    inactive = rows[None, :] < top[:, None]
    lhs = jnp.where(inactive[:, :, None],
                    jnp.zeros((1, 1, NBAND), dtype)
                    .at[:, :, 2].set(1.0), lhs)
    rhs = jnp.where(inactive, 0.0, rhs)
    return lhs, rhs


def pdma_solve(lhs, rhs):
    """Batched pentadiagonal solve (Askar & Karawia 2015 transformations)
    as two ``lax.scan``s over the 21 rows (same per-row arithmetic as a
    static unroll — the recurrence is sequential either way — but ~20x
    less HLO; the batch axis supplies the parallelism).

    Reference: ``pentadiagonal_solver_impl.hh:14-76`` (``PDMA``); identity
    padding replaces the reference's variable start row.
    """
    N = NSYS

    d = lambda i, b: lhs[:, i, b]
    # generic recurrence; identity rows yield A=B=Z=0 so starting at row 0
    # is exactly the reference's start at the top active row
    U = 1.0 / d(0, 2)
    A0 = d(0, 1) * U
    B0 = d(0, 0) * U
    Z0 = rhs[:, 0] * U

    Y = d(1, 3)
    U = 1.0 / (d(1, 2) - A0 * Y)
    A1 = (d(1, 1) - B0 * Y) * U
    B1 = d(1, 0) * U
    Z1 = (rhs[:, 1] - Z0 * Y) * U

    def fwd(carry, x):
        Am2, Bm2, Zm2, Am1, Bm1, Zm1 = carry
        di, ri = x
        Y = di[:, 3] - Am2 * di[:, 4]
        U = 1.0 / (di[:, 2] - Bm2 * di[:, 4] - Am1 * Y)
        Ai = (di[:, 1] - Bm1 * Y) * U
        Bi = di[:, 0] * U
        Zi = (ri - Zm2 * di[:, 4] - Zm1 * Y) * U
        return (Am1, Bm1, Zm1, Ai, Bi, Zi), (Ai, Bi, Zi)

    _, (At, Bt, Zt) = jax.lax.scan(
        fwd, (A0, B0, Z0, A1, B1, Z1),
        (jnp.moveaxis(lhs[:, 2:], 1, 0), jnp.moveaxis(rhs[:, 2:], 1, 0)))
    A = jnp.concatenate([A0[None], A1[None], At], axis=0)  # [N, ncol]
    B = jnp.concatenate([B0[None], B1[None], Bt], axis=0)
    Z = jnp.concatenate([Z0[None], Z1[None], Zt], axis=0)

    x_last = Z[N - 1]
    x_prev = Z[N - 2] - A[N - 2] * x_last

    def bwd(carry, row):
        xp1, xp2 = carry
        Zi, Ai, Bi = row
        xi = Zi - Ai * xp1 - Bi * xp2
        return (xi, xp1), xi

    _, x_head = jax.lax.scan(bwd, (x_prev, x_last),
                             (Z[:N - 2], A[:N - 2], B[:N - 2]),
                             reverse=True)
    x = jnp.concatenate([x_head, x_prev[None], x_last[None]], axis=0)
    return jnp.moveaxis(x, 0, 1)


class SolveOut(NamedTuple):
    t_soisno: jnp.ndarray
    t_h2osfc: jnp.ndarray


def update_temperature(snl, frac_h2osfc, tvector, t_soisno_old) -> SolveOut:
    """Scatter the 21-row solution back into t_soisno / t_h2osfc.

    Reference: ``soil_temperature_impl.hh:152-176``.
    """
    nsno = c.NLEVSNO
    lev = jnp.arange(nsno)
    active = lev[None, :] >= (nsno - snl)[:, None]
    t_snow = jnp.where(active, tvector[:, :nsno], t_soisno_old[:, :nsno])
    t_soil = tvector[:, nsno + 1:]
    t_soisno = jnp.concatenate([t_snow, t_soil], axis=1)
    t_h2osfc = jnp.where(frac_h2osfc != 0.0, tvector[:, nsno],
                         t_soisno[:, nsno])
    return SolveOut(t_soisno, t_h2osfc)


def update_t_grnd(snl, frac_h2osfc, frac_sno_eff, t_h2osfc, t_soisno):
    """Reference: ``soil_temperature_impl.hh:178-205``."""
    nsno = c.NLEVSNO
    t_top_sno = take_layer(t_soisno, nsno - snl)
    t_top_soil = t_soisno[:, nsno]
    has_sfc = frac_h2osfc != 0.0
    with_snow = jnp.where(
        has_sfc,
        frac_sno_eff * t_top_sno
        + (1.0 - frac_sno_eff - frac_h2osfc) * t_top_soil
        + frac_h2osfc * t_h2osfc,
        frac_sno_eff * t_top_sno + (1.0 - frac_sno_eff) * t_top_soil)
    without = jnp.where(
        has_sfc,
        (1.0 - frac_h2osfc) * t_top_soil + frac_h2osfc * t_h2osfc,
        t_top_soil)
    return jnp.where(snl > 0, with_snow, without)


class PhaseChangeH2osfcOut(NamedTuple):
    t_h2osfc: jnp.ndarray
    h2osfc: jnp.ndarray
    xmf_h2osfc: jnp.ndarray
    qflx_h2osfc_to_ice: jnp.ndarray
    eflx_h2osfc_to_snow: jnp.ndarray
    h2osno: jnp.ndarray
    int_snow: jnp.ndarray
    snow_depth: jnp.ndarray
    h2osoi_ice_sl1: jnp.ndarray  # bottom snow layer ice
    t_soisno_sl1: jnp.ndarray    # bottom snow layer temperature


def phase_change_h2osfc(snl, dtime, frac_sno, frac_h2osfc, dhsdT, c_h2osfc,
                        fact_sl1, t_h2osfc, h2osfc, h2osno, int_snow,
                        snow_depth, h2osoi_ice_sl1,
                        t_soisno_sl1) -> PhaseChangeH2osfcOut:
    """Freezing of standing surface water into the snow pack.

    Reference: ``phase_change_impl.hh:12-153`` (``phase_change_h2osfc``).
    """
    frz = (frac_h2osfc > 0.0) & (t_h2osfc <= c.TFRZ)

    tinc = c.TFRZ - t_h2osfc
    hm = frac_h2osfc * (dhsdT * tinc - tinc * c_h2osfc / dtime)
    xm = hm * dtime / c.HFUS
    temp1 = h2osfc + xm
    z_avg = frac_sno * snow_depth
    rho_avg = jnp.where(z_avg > 0.0,
                        jnp.minimum(800.0, safe_div(h2osno, z_avg,
                                                    z_avg > 0.0)), 200.0)

    # ---------------- partial freeze (xm < h2osfc): temp1 >= 0 -------------
    part = frz & (temp1 >= 0.0)
    h2osno_p = h2osno - xm
    int_snow_p = int_snow - xm
    ice_p = jnp.where(snl > 0, h2osoi_ice_sl1 - xm, h2osoi_ice_sl1)
    h2osfc_p = h2osfc + xm
    xmf_p = hm
    qflx_p = -xm / dtime
    depth_p = jnp.where((frac_sno > 0) & (snl > 0),
                        safe_div(h2osno_p, rho_avg * frac_sno,
                                 (rho_avg * frac_sno) != 0.0),
                        h2osno_p / c.DENICE)
    # snow-layer temperature adjustment
    fact_safe = jnp.where(fact_sl1 != 0.0, fact_sl1, 1.0)
    c1_p = jnp.where(snl == 1, frac_sno * (dtime / fact_safe - dhsdT * dtime),
                     frac_sno / fact_safe * dtime)
    c2_p = jnp.where(frac_h2osfc != 0.0,
                     -c.CPWAT * xm - frac_h2osfc * dhsdT * dtime, 0.0)
    den_p = jnp.where(c1_p + c2_p != 0.0, c1_p + c2_p, 1.0)
    t_sl1_p = jnp.where(snl == 0, c.TFRZ,
                        (c1_p * t_soisno_sl1 + c2_p * c.TFRZ) / den_p)
    eflx_p = jnp.where(snl == 0, 0.0, (c.TFRZ - t_sl1_p) * c2_p / dtime)

    # ---------------- full freeze (xm > h2osfc): temp1 < 0 -----------------
    full = frz & (temp1 < 0.0)
    den_rho = jnp.where(h2osno + h2osfc != 0.0, h2osno + h2osfc, 1.0)
    rho_avg_f = (h2osno * rho_avg + h2osfc * c.DENICE) / den_rho
    h2osno_f = h2osno + h2osfc
    int_snow_f = int_snow + h2osfc
    qflx_f = h2osfc / dtime
    ice_f = jnp.where(snl > 0, h2osoi_ice_sl1 + h2osfc, h2osoi_ice_sl1)
    t_sfc_cooled = c.TFRZ - temp1 * c.HFUS / (dtime * dhsdT - c_h2osfc)
    xmf_f = hm - frac_h2osfc * temp1 * c.HFUS / dtime
    c1_f = jnp.where(snl == 1, frac_sno * (dtime / fact_safe - dhsdT * dtime),
                     frac_sno / fact_safe * dtime)
    c2_f = jnp.where(frac_h2osfc != 0.0,
                     frac_h2osfc * (c_h2osfc - dtime * dhsdT), 0.0)
    den_f = jnp.where(c1_f + c2_f != 0.0, c1_f + c2_f, 1.0)
    t_sl1_f = jnp.where(
        snl == 0, t_sfc_cooled,
        (c1_f * t_soisno_sl1 + c2_f * t_sfc_cooled) / den_f)
    t_sfc_f = t_sl1_f  # t_h2osfc follows the combined layer (snl>0 cases)
    t_sfc_f = jnp.where(snl == 0, t_sfc_cooled, t_sfc_f)
    depth_f = jnp.where((frac_sno > 0.0) & (snl > 0),
                        safe_div(h2osno_f, rho_avg_f * frac_sno,
                                 (rho_avg_f * frac_sno) != 0.0),
                        h2osno_f / c.DENICE)

    def pick(pv, fv, ov):
        return jnp.where(part, pv, jnp.where(full, fv, ov))

    return PhaseChangeH2osfcOut(
        t_h2osfc=pick(jnp.full_like(t_h2osfc, c.TFRZ), t_sfc_f, t_h2osfc),
        h2osfc=pick(h2osfc_p, jnp.zeros_like(h2osfc), h2osfc),
        xmf_h2osfc=pick(xmf_p, xmf_f, jnp.zeros_like(h2osfc)),
        qflx_h2osfc_to_ice=pick(qflx_p, qflx_f, jnp.zeros_like(h2osfc)),
        eflx_h2osfc_to_snow=pick(eflx_p, jnp.zeros_like(h2osfc),
                                 jnp.zeros_like(h2osfc)),
        h2osno=pick(h2osno_p, h2osno_f, h2osno),
        int_snow=pick(int_snow_p, int_snow_f, int_snow),
        snow_depth=pick(depth_p, depth_f, snow_depth),
        h2osoi_ice_sl1=pick(ice_p, ice_f, h2osoi_ice_sl1),
        t_soisno_sl1=pick(t_sl1_p, t_sl1_f, t_soisno_sl1))


class PhaseChangeSoisnoOut(NamedTuple):
    h2osno: jnp.ndarray
    snow_depth: jnp.ndarray
    xmf: jnp.ndarray
    qflx_snofrz: jnp.ndarray
    qflx_snow_melt: jnp.ndarray
    qflx_snomelt: jnp.ndarray
    eflx_snomelt: jnp.ndarray
    imelt: jnp.ndarray           # [ncol, NLEVTOT]
    qflx_snofrz_lyr: jnp.ndarray  # [ncol, NLEVSNO]
    h2osoi_ice: jnp.ndarray
    h2osoi_liq: jnp.ndarray
    t_soisno: jnp.ndarray


def phase_change_soisno(land: c.LandType, snl, dtime, dhsdT, frac_h2osfc,
                        frac_sno_eff, fact, watsat, sucsat, bsw, dz, h2osno,
                        snow_depth, h2osoi_ice, h2osoi_liq,
                        t_soisno) -> PhaseChangeSoisnoOut:
    """Post-solve melt/freeze correction for snow and soil layers.

    Reference: ``phase_change_impl.hh:184-417`` (``phase_change_soisno``).
    The per-layer loop has a single sequential dependency — the thin-snow
    adjustment of h2osno/snow_depth at the top-soil layer — handled
    explicitly; everything else vectorizes over layers.
    """
    nsno = c.NLEVSNO
    ntot = c.NLEVTOT
    lev = jnp.arange(ntot)
    top = (nsno - snl)[:, None]
    active = lev[None, :] >= top
    is_snow = lev[None, :] < nsno
    is_soil = ~is_snow
    at_top = lev[None, :] == top
    at_topsoil = lev[None, :] == nsno

    # ---- melt/freeze identification (sets T to TFRZ, computes tinc) -------
    melt = active & (h2osoi_ice > 0.0) & (t_soisno > c.TFRZ)
    imelt = jnp.where(melt, 1, 0)

    # supercooled water content for soil layers (Zhao 1997, Koren 1999)
    scmask = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    if scmask is not False:
        t_soil = t_soisno[:, nsno:]
        smp = (c.HFUS * (c.TFRZ - t_soil) / (c.GRAV * t_soil) * 1000.0)
        sc = (watsat * jnp.maximum(smp / sucsat, 1e-300)
              ** (-1.0 / bsw) * dz[:, nsno:] * 1000.0)
        supercool = c.lsel(scmask, jnp.where(t_soil < c.TFRZ, sc, 0.0),
                           jnp.zeros_like(watsat))
    else:
        supercool = jnp.zeros_like(watsat)
    supercool_full = jnp.concatenate(
        [jnp.zeros_like(h2osoi_ice[:, :nsno]), supercool], axis=1)

    frz_sno = active & is_snow & (h2osoi_liq > 0.0) & (t_soisno < c.TFRZ)
    frz_soil = (active & is_soil & (h2osoi_liq > supercool_full)
                & (t_soisno < c.TFRZ))
    imelt = jnp.where(frz_sno | frz_soil, 2, imelt)

    # thin snow on bare soil: melt at the top soil layer
    thin = ((snl == 0) & (h2osno > 0.0))[:, None] & at_topsoil
    thin_melt = thin & (t_soisno > c.TFRZ)
    imelt = jnp.where(thin_melt, 1, imelt)

    changed = imelt > 0
    tinc = jnp.where(changed, c.TFRZ - t_soisno, 0.0)
    t_soisno = jnp.where(changed, c.TFRZ, t_soisno)

    # ---- energy surplus/deficit hm ----------------------------------------
    fact_safe = jnp.where(fact != 0.0, fact, 1.0)
    hm_top_snow = frac_sno_eff[:, None] * (dhsdT[:, None] * tinc
                                           - tinc / fact_safe)
    hm_top_soil_raw = dhsdT[:, None] * tinc - tinc / fact_safe
    hm_top_soil = jnp.where((frac_h2osfc != 0.0)[:, None],
                            hm_top_soil_raw
                            - frac_h2osfc[:, None] * dhsdT[:, None] * tinc,
                            hm_top_soil_raw)
    hm_under = ((1.0 - frac_sno_eff - frac_h2osfc)[:, None]
                * dhsdT[:, None] * tinc - tinc / fact_safe)
    hm_int_snow = -frac_sno_eff[:, None] * (tinc / fact_safe)
    hm_int_soil = -tinc / fact_safe

    hm = jnp.where(
        at_top, jnp.where(is_snow, hm_top_snow, hm_top_soil),
        jnp.where(at_topsoil, hm_under,
                  jnp.where(is_snow, hm_int_snow, hm_int_soil)))
    hm = jnp.where(changed, hm, 0.0)

    # tridiagonal round-off guards
    bad1 = (imelt == 1) & (hm < 0.0)
    bad2 = (imelt == 2) & (hm > 0.0)
    hm = jnp.where(bad1 | bad2, 0.0, hm)
    imelt = jnp.where(bad1 | bad2, 0, imelt)

    do_pc = (imelt > 0) & (jnp.abs(hm) > 0.0)
    xm = hm * dtime / c.HFUS

    # ---- thin-snow melt at top soil layer (mutates h2osno/snow_depth) -----
    xm_ts = jnp.where(at_topsoil, xm, 0.0).sum(axis=1)
    hm_ts = jnp.where(at_topsoil, hm, 0.0).sum(axis=1)
    do_ts = ((snl == 0) & (h2osno > 0.0) & (xm_ts > 0.0)
             & (jnp.abs(hm_ts) > 0.0)
             & (imelt[:, nsno] > 0))
    temp1 = h2osno
    h2osno_new = jnp.maximum(0.0, temp1 - xm_ts)
    propor = safe_div(h2osno_new, temp1, temp1 != 0.0)
    heatr_ts = hm_ts - c.HFUS * (temp1 - h2osno_new) / dtime
    xm_ts_new = jnp.where(heatr_ts > 0.0, heatr_ts * dtime / c.HFUS, 0.0)
    hm_ts_new = jnp.where(heatr_ts > 0.0, heatr_ts, 0.0)
    qflx_snomelt0 = jnp.where(do_ts,
                              jnp.maximum(0.0, temp1 - h2osno_new) / dtime,
                              0.0)
    xmf0 = jnp.where(do_ts, c.HFUS * qflx_snomelt0, 0.0)
    h2osno = jnp.where(do_ts, h2osno_new, h2osno)
    snow_depth = jnp.where(do_ts, snow_depth * propor, snow_depth)
    xm = jnp.where(at_topsoil & do_ts[:, None], xm_ts_new[:, None], xm)
    hm = jnp.where(at_topsoil & do_ts[:, None], hm_ts_new[:, None], hm)

    # ---- ice/liquid adjustment --------------------------------------------
    wmass0 = h2osoi_ice + h2osoi_liq
    wice0 = h2osoi_ice
    ice_melting = jnp.maximum(0.0, wice0 - xm)
    ice_freezing_snow = jnp.minimum(wmass0, wice0 - xm)
    ice_freezing_soil = jnp.where(
        wmass0 < supercool_full, 0.0,
        jnp.minimum(wmass0 - supercool_full, wice0 - xm))
    ice_new = jnp.where(
        xm > 0.0, ice_melting,
        jnp.where(xm < 0.0,
                  jnp.where(is_snow, ice_freezing_snow, ice_freezing_soil),
                  wice0))
    ice_new = jnp.where(do_pc, ice_new, h2osoi_ice)
    heatr = jnp.where(do_pc & (xm != 0.0),
                      hm - c.HFUS * (wice0 - ice_new) / dtime, 0.0)
    liq_new = jnp.where(do_pc, jnp.maximum(0.0, wmass0 - ice_new),
                        h2osoi_liq)

    # ---- residual-heat temperature adjustment -----------------------------
    fse = frac_sno_eff[:, None]
    fse_safe = jnp.where(fse != 0.0, fse, 1.0)
    adj_top = jnp.where(
        (snl == 0)[:, None],
        fact * heatr / (1.0 - (1.0 - frac_h2osfc[:, None]) * fact
                        * dhsdT[:, None]),
        (fact / fse_safe) * heatr / (1.0 - fact * dhsdT[:, None]))
    adj_topsoil = fact * heatr / (
        1.0 - (1.0 - fse - frac_h2osfc[:, None]) * fact * dhsdT[:, None])
    adj_soil = fact * heatr
    adj_snow = jnp.where(fse > 0.0, (fact / fse_safe) * heatr, 0.0)
    adj = jnp.where(at_top, adj_top,
                    jnp.where(at_topsoil, adj_topsoil,
                              jnp.where(is_soil, adj_soil, adj_snow)))
    apply_adj = do_pc & (jnp.abs(heatr) > 0.0)
    t_soisno = t_soisno + jnp.where(apply_adj, adj, 0.0)
    # snow layers with coexisting liquid+ice snap to freezing
    snap = apply_adj & is_snow & (liq_new * ice_new > 0.0)
    t_soisno = jnp.where(snap, c.TFRZ, t_soisno)

    # ---- flux accumulation -------------------------------------------------
    dice = jnp.where(do_pc, wice0 - ice_new, 0.0)
    xmf = xmf0 + jnp.sum(c.HFUS * dice / dtime, axis=1)
    qflx_snomelt = qflx_snomelt0 + jnp.sum(
        jnp.where((imelt == 1) & is_snow & do_pc,
                  jnp.maximum(0.0, dice) / dtime, 0.0), axis=1)
    qflx_snofrz_lyr = jnp.where(
        (imelt[:, :nsno] == 2) & do_pc[:, :nsno],
        jnp.maximum(0.0, ice_new[:, :nsno] - wice0[:, :nsno]) / dtime, 0.0)
    qflx_snofrz = jnp.sum(
        jnp.where(imelt[:, :nsno] == 2, qflx_snofrz_lyr, 0.0), axis=1)
    qflx_snow_melt = jnp.where(do_ts, qflx_snomelt0, 0.0)
    eflx_snomelt = qflx_snomelt * c.HFUS

    return PhaseChangeSoisnoOut(
        h2osno=h2osno, snow_depth=snow_depth, xmf=xmf,
        qflx_snofrz=qflx_snofrz, qflx_snow_melt=qflx_snow_melt,
        qflx_snomelt=qflx_snomelt, eflx_snomelt=eflx_snomelt, imelt=imelt,
        qflx_snofrz_lyr=qflx_snofrz_lyr, h2osoi_ice=ice_new,
        h2osoi_liq=liq_new, t_soisno=t_soisno)
