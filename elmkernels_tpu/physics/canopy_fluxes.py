"""Vegetated-surface energy/water fluxes: leaf temperature Newton iteration
with embedded sun/shade photosynthesis — batched over columns.

TPU-native rebuild of
``/root/reference/src/physics/canopy_fluxes_impl.hh:15-542`` (from ELM's
CanopyFluxesMod.F90).  The ≤40-iteration stability loop is a masked
``lax.while_loop`` over the batch: each column follows exactly the
reference's per-column iteration sequence (including the Monin-Obukhov
sign-flip damping and the dual convergence test), with converged columns
frozen, so the batch matches the scalar reference bit-closely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import friction_velocity as fv
from elmkernels_tpu.physics import photosynthesis as psn
from elmkernels_tpu.physics import soil_moist_stress as sms
from elmkernels_tpu.physics.qsat import qsat
from elmkernels_tpu.physics.math_utils import take_layer


class InitFluxOut(NamedTuple):
    btran: jnp.ndarray
    displa: jnp.ndarray
    z0mv: jnp.ndarray
    z0hv: jnp.ndarray
    z0qv: jnp.ndarray
    rootr: jnp.ndarray         # [ncol, nlevgrnd]
    eff_porosity: jnp.ndarray  # [ncol, nlevgrnd]
    dayl_factor: jnp.ndarray
    air: jnp.ndarray
    bir: jnp.ndarray
    cir: jnp.ndarray
    el: jnp.ndarray
    qsatl: jnp.ndarray
    qsatldT: jnp.ndarray
    taf: jnp.ndarray
    qaf: jnp.ndarray
    um: jnp.ndarray
    ur: jnp.ndarray
    obu: jnp.ndarray
    zldis: jnp.ndarray
    delq: jnp.ndarray
    t_veg: jnp.ndarray


def initialize_flux(land: c.LandType, p: psn.PFTPsnParams, snl,
                    frac_veg_nosno, frac_sno, forc_hgt_u_patch, thm, thv,
                    max_dayl, dayl, altmax_indx, altmax_lastyear_indx,
                    t_soisno, h2osoi_ice, h2osoi_liq, dz, rootfr, sucsat,
                    watsat, bsw, elai, esai, emv, emg, qg, t_grnd, forc_t,
                    forc_pbot, forc_lwrad, forc_u, forc_v, forc_q, forc_th,
                    z0mg, displa, z0mv, t_veg) -> InitFluxOut:
    """Pre-iteration setup: btran/rootr from soil moisture stress,
    canopy-density-modified aerodynamic parameters, longwave coefficients,
    and the initial Monin-Obukhov state.

    Reference: ``canopy_fluxes_impl.hh:93-183`` (``initialize_flux``).
    Bare columns (frac_veg_nosno == 0) get btran = 0, t_veg = forc_t,
    rootr = 0, remaining outputs zeroed.
    """
    tlsai_crit = 2.0
    veg = frac_veg_nosno != 0

    dayl_factor = jnp.clip((dayl * dayl) / (max_dayl * max_dayl), 0.01, 1.0)

    def lay(v):
        # per-column trait -> broadcastable against [ncol, nlev] layers
        return v[:, None] if getattr(v, "ndim", 0) == 1 else v

    eff_porosity = sms.calc_effective_soilporosity(watsat, h2osoi_ice, dz)
    h2osoi_liqvol = sms.calc_volumetric_h2oliq(eff_porosity, h2osoi_liq, dz)
    rms = sms.calc_root_moist_stress(
        h2osoi_liqvol, rootfr, t_soisno, lay(p.tc_stress), sucsat, watsat,
        bsw, lay(p.smpso), lay(p.smpsc), eff_porosity, altmax_indx,
        altmax_lastyear_indx, jnp.zeros_like(t_grnd))

    lt = jnp.minimum(elai + esai, tlsai_crit)
    import math
    egvf = (1.0 - jnp.exp(-lt)) / (1.0 - math.exp(-tlsai_crit))
    displa_v = displa * egvf
    z0mv_v = jnp.exp(egvf * jnp.log(z0mv) + (1.0 - egvf) * jnp.log(z0mg))

    air = emv * (1.0 + (1.0 - emv) * (1.0 - emg)) * forc_lwrad
    bir = -(2.0 - emv * (1.0 - emg)) * emv * c.STEBOL
    cir = emv * emg * c.STEBOL

    qs = qsat(t_veg, forc_pbot)
    taf = (t_grnd + thm) / 2.0
    qaf = (forc_q + qg) / 2.0
    ur = jnp.maximum(1.0, jnp.sqrt(forc_u * forc_u + forc_v * forc_v))
    dth = thm - taf
    dqh = forc_q - qaf
    delq = qg - qaf
    dthv = dth * (1.0 + 0.61 * forc_q) + 0.61 * forc_th * dqh
    zldis = forc_hgt_u_patch - displa_v
    mo = fv.monin_obukhov_length(ur, thv, dthv, zldis, z0mv_v)

    z = jnp.zeros_like(t_grnd)
    def w(vval, bval=None):
        return jnp.where(veg, vval, z if bval is None else bval)
    return InitFluxOut(
        btran=jnp.where(veg, rms.btran, 0.0),
        displa=w(displa_v), z0mv=w(z0mv_v), z0hv=w(z0mv_v), z0qv=w(z0mv_v),
        rootr=jnp.where(veg[:, None], rms.rootr, 0.0),
        eff_porosity=eff_porosity,
        dayl_factor=w(dayl_factor), air=w(air), bir=w(bir), cir=w(cir),
        el=w(qs.es), qsatl=w(qs.qs), qsatldT=w(qs.qsdT), taf=w(taf),
        qaf=w(qaf), um=w(mo.um), ur=w(ur), obu=w(mo.obu), zldis=w(zldis),
        delq=w(delq), t_veg=jnp.where(veg, t_veg, forc_t))


class StabilityOut(NamedTuple):
    btran: jnp.ndarray
    qflx_tran_veg: jnp.ndarray
    qflx_evap_veg: jnp.ndarray
    eflx_sh_veg: jnp.ndarray
    wtg: jnp.ndarray
    wtl0: jnp.ndarray
    wta0: jnp.ndarray
    wtal: jnp.ndarray
    el: jnp.ndarray
    qsatl: jnp.ndarray
    qsatldT: jnp.ndarray
    taf: jnp.ndarray
    qaf: jnp.ndarray
    um: jnp.ndarray
    dth: jnp.ndarray
    dqh: jnp.ndarray
    obu: jnp.ndarray
    temp1: jnp.ndarray
    temp2: jnp.ndarray
    temp12m: jnp.ndarray
    temp22m: jnp.ndarray
    tlbef: jnp.ndarray
    delq: jnp.ndarray
    dt_veg: jnp.ndarray
    t_veg: jnp.ndarray
    wtgq: jnp.ndarray
    wtalq: jnp.ndarray
    wtlq0: jnp.ndarray
    wtaq0: jnp.ndarray
    itlef: jnp.ndarray  # iterations used (diagnostic; reference loop var)
    ci: jnp.ndarray     # [2*ncol] sun|shade ci roots (warm-start carry)
    psn_iters: jnp.ndarray  # i32 [2*ncol] total inner secant iterations


class _LoopState(NamedTuple):
    """Slim while-loop carry (r4 carry slimming, VERDICT r3 items 2/6).

    Only true recurrence state is carried, plus ENTRY-state snapshots
    (``p_*``) of each column's final active iteration; the ~20
    final-iteration output arrays the r3 loop carried (wt chains, 2m
    profile factors, qflx/eflx) are recomputed ONCE post-loop from the
    snapshots via the same ``_chain1``/``_chain2`` helpers the body
    uses — identical arithmetic, ~25% less carry traffic across the
    sequential loop boundary (the S(1) spill pairs in the r3 roofline).
    """
    # recurrence state (read by the next iteration)
    t_veg: jnp.ndarray
    el: jnp.ndarray
    qsatl: jnp.ndarray
    qsatldT: jnp.ndarray
    taf: jnp.ndarray
    qaf: jnp.ndarray
    um: jnp.ndarray
    obu: jnp.ndarray
    delq: jnp.ndarray
    btran: jnp.ndarray
    del_: jnp.ndarray
    efeb: jnp.ndarray
    obuold: jnp.ndarray
    nmozsgn: jnp.ndarray
    itlef: jnp.ndarray
    stop: jnp.ndarray
    ci: jnp.ndarray  # [2*ncol] sun|shade ci roots (warm-start carry;
    #                  dead and DCE'd by XLA when warm_start is off)
    psn_iters: jnp.ndarray  # i32 [2*ncol] accumulated inner secant iters
    # entry snapshots of the final active iteration (output recompute)
    p_t_veg: jnp.ndarray
    p_qsatl: jnp.ndarray
    p_qsatldT: jnp.ndarray
    p_taf: jnp.ndarray
    p_qaf: jnp.ndarray
    p_um: jnp.ndarray
    p_obu: jnp.ndarray
    p_delq: jnp.ndarray
    p_efeb: jnp.ndarray
    p_rssun: jnp.ndarray
    p_rssha: jnp.ndarray


def stability_iteration(land: c.LandType, p: psn.PFTPsnParams, dtime, snl,
                        frac_veg_nosno, frac_sno, forc_hgt_u_patch,
                        forc_hgt_t_patch, forc_hgt_q_patch, fwet, fdry,
                        laisun, laisha, forc_rho, snow_depth, soilbeta,
                        frac_h2osfc, t_h2osfc, sabv, h2ocan, htop, t_soisno,
                        air, bir, cir, ur, zldis, displa, elai, esai, t_grnd,
                        forc_pbot, forc_q, forc_th, z0mg, z0mv, z0hv, z0qv,
                        thm, thv, qg, nrad, t10, tlai_z, vcmaxcintsha,
                        vcmaxcintsun, parsha_z, parsun_z, laisha_z, laisun_z,
                        forc_pco2, forc_po2, dayl_factor, btran, el, qsatl,
                        qsatldT, taf, qaf, um, obu, delq,
                        t_veg, psn_mode: str | None = None,
                        *, soybean, warm_start: bool = False,
                        ci_prev=None) -> StabilityOut:
    """Leaf-temperature Newton iteration (≤40 iterations + convergence on
    both Δt_veg < 0.01 K and Δefe < 0.1 W/m²), with per-iteration sun and
    shade photosynthesis solves.

    Reference: ``canopy_fluxes_impl.hh:185-452`` (``stability_iteration``).
    ``psn_mode``/``soybean`` support per-column vegetation: ``psn_mode`` is
    the static photosynthesis pathway (None derives it from concrete
    traits), ``soybean`` the per-column btran-boost mask.  The mask is
    MANDATORY and derived in one place (``driver/step.py`` from
    ``params.vtype``) — a scalar ``land.vtype`` fallback would silently
    broadcast column 0's PFT branch over a heterogeneous batch.

    ``warm_start=True`` (opt-in perf mode; changes solver iteration
    paths, so the reference-exact default is off) warm-starts the ci
    solve: each outer iteration's psn call starts from the previous
    iteration's converged roots, and the first from ``ci_prev`` — the
    previous *step*'s roots ([2*ncol] sun|shade, 0 = cold).  The
    converged physics is unchanged; only convergence trajectories (and
    hence iteration counts and last-ulp rounding) differ.
    """
    btran0 = 0.0
    beta = 1.0
    zii = 1000.0
    ria = 0.5
    dlemin = 0.1
    dtmin = 0.01
    itmax = 40
    itmin = 2

    veg = frac_veg_nosno != 0
    t_top_sno = take_layer(t_soisno, c.NLEVSNO - snl)
    t_top_soil = t_soisno[:, c.NLEVSNO]
    # stack sun+shade: per-column traits and masks are tiled to [2*ncol]
    p2 = psn.tile_traits(p, 2)

    def _chain1(um_e, obu_e, taf_e):
        """Aerodynamic-resistance chain from iteration-entry (um, obu,
        taf) — used per iteration by the loop body AND once post-loop
        to recompute the final-iteration outputs (identical
        arithmetic)."""
        ustar = fv.friction_velocity_wind(forc_hgt_u_patch, displa, um_e,
                                          obu_e, z0mv)
        temp1 = fv.friction_velocity_temp(forc_hgt_t_patch, displa, obu_e,
                                          z0hv)
        temp2 = fv.friction_velocity_humidity(forc_hgt_q_patch,
                                              forc_hgt_t_patch, displa,
                                              obu_e, z0hv, z0qv, temp1)
        ram = 1.0 / (ustar * ustar / um_e)
        rah0 = 1.0 / (temp1 * ustar)
        raw0 = 1.0 / (temp2 * ustar)
        uaf = um_e * jnp.sqrt(1.0 / (ram * um_e))
        cf_leaf = 0.01 / (jnp.sqrt(uaf) * jnp.sqrt(p.dleaf))
        rb = 1.0 / (cf_leaf * uaf)

        w = jnp.exp(-(elai + esai))
        csoilb = c.VKC / (0.13 * (z0mg * uaf / 1.5e-5) ** 0.45)
        ri = (c.GRAV * htop * (taf_e - t_grnd)) / (taf_e * uaf ** 2.0)
        ricsoilc = c.CSOILC / (1.0 + ria * jnp.minimum(ri, 10.0))
        csoilcn = jnp.where(taf_e - t_grnd > 0.0,
                            csoilb * w + ricsoilc * (1.0 - w),
                            csoilb * w + c.CSOILC * (1.0 - w))
        rah1 = 1.0 / (csoilcn * uaf)
        raw1 = rah1
        return (ustar, temp1, temp2, rah0, raw0, rb, uaf, rah1, raw1)

    def _chain2(c1, t_veg_e, qsatl_e, qsatldT_e, qaf_e, delq_e, efeb_e,
                btran_i, rssun, rssha):
        """Flux/energy-balance chain of one iteration from its entry
        state + that iteration's stomatal resistances.  Returns both
        the recurrence drivers (efe, dt_veg, wt factors) and the
        final-iteration outputs (qflx/eflx, wt chains)."""
        ustar, temp1, temp2, rah0, raw0, rb, uaf, rah1, raw1 = c1
        wta = 1.0 / rah0
        wtl = (elai + esai) / rb
        wtg = 1.0 / rah1
        wtshi = 1.0 / (wta + wtl + wtg)
        wtl0 = wtl * wtshi
        wtg0 = wtg * wtshi
        wta0 = wta * wtshi
        wtga = wta0 + wtg0
        wtal = wta0 + wtl0

        rppdry = jnp.where(
            fdry > 0.0,
            fdry * rb * (laisun / (rb + rssun) + laisha / (rb + rssha))
            / elai, 0.0)

        efpot = forc_rho * wtl * (qsatl_e - qaf_e)
        can_tran = btran_i > btran0
        qflx_tran_veg = jnp.where(
            (efpot > 0.0) & can_tran, efpot * rppdry, 0.0)
        rpp = jnp.where(efpot > 0.0,
                        jnp.where(can_tran, rppdry + fwet, fwet), 1.0)
        efpot_safe = jnp.where(efpot != 0.0, efpot, 1.0)
        rpp = jnp.where(
            efpot > 0.0,
            jnp.minimum(rpp, (qflx_tran_veg + h2ocan / dtime) / efpot_safe),
            rpp)

        fveg = frac_veg_nosno.astype(t_veg_e.dtype)
        wtaq = fveg / raw0
        wtlq = fveg * (elai + esai) / rb * rpp
        snow_depth_c = 0.05
        fsno_dl = snow_depth / snow_depth_c
        elai_dl = 0.5 * (1.0 - jnp.minimum(fsno_dl, 1.0))
        rdl = (1.0 - jnp.exp(-elai_dl)) / (0.004 * uaf)
        wtgq = jnp.where(delq_e < 0.0, fveg / (raw1 + rdl),
                         soilbeta * fveg / (raw1 + rdl))
        wtsqi = 1.0 / (wtaq + wtlq + wtgq)
        wtgq0 = wtgq * wtsqi
        wtlq0 = wtlq * wtsqi
        wtaq0 = wtaq * wtsqi
        wtgaq = wtaq0 + wtgq0
        wtalq = wtaq0 + wtlq0
        dc1 = forc_rho * c.CPAIR * wtl
        dc2 = c.HVAP * forc_rho * wtlq
        efsh = dc1 * (wtga * t_veg_e - wtg0 * t_grnd - wta0 * thm)
        efe = dc2 * (wtgaq * qsatl_e - wtgq0 * qg - wtaq0 * forc_q)

        # damp oscillating leaf latent heat flux
        osc = efe * efeb_e < 0.0
        erre = jnp.where(osc, 0.1 * efe - efe, 0.0)
        efe = jnp.where(osc, 0.1 * efe, efe)

        lw_grnd = (frac_sno * t_top_sno ** 4.0
                   + (1.0 - frac_sno - frac_h2osfc) * t_top_soil ** 4.0
                   + frac_h2osfc * t_h2osfc ** 4.0)
        dt_veg = ((sabv + air + bir * t_veg_e ** 4.0 + cir * lw_grnd
                   - efsh - efe)
                  / (-4.0 * bir * t_veg_e ** 3.0 + dc1 * wtga
                     + dc2 * wtgaq * qsatldT_e))
        t_veg_n = t_veg_e + dt_veg
        dels = dt_veg
        del_ = jnp.abs(dels)
        big = del_ > 1.0
        dt_veg = jnp.where(big, dels / jnp.where(big, del_, 1.0), dt_veg)
        t_veg_n = jnp.where(big, t_veg_e + dt_veg, t_veg_n)
        err = jnp.where(
            big,
            sabv + air + bir * t_veg_e ** 3.0 * (t_veg_e + 4.0 * dt_veg)
            + cir * lw_grnd - (efsh + dc1 * wtga * dt_veg)
            - (efe + dc2 * wtgaq * qsatldT_e * dt_veg), 0.0)

        efpot2 = forc_rho * wtl * (wtgaq * (qsatl_e + qsatldT_e * dt_veg)
                                   - wtgq0 * qg - wtaq0 * forc_q)
        qflx_evap_veg = rpp * efpot2
        qflx_tran_veg = jnp.where((efpot2 > 0.0) & can_tran,
                                  efpot2 * rppdry, 0.0)
        ecidif = jnp.maximum(
            0.0, qflx_evap_veg - qflx_tran_veg - h2ocan / dtime)
        qflx_evap_veg = jnp.minimum(qflx_evap_veg,
                                    qflx_tran_veg + h2ocan / dtime)
        eflx_sh_veg = (efsh + dc1 * wtga * dt_veg + err + erre
                       + c.HVAP * ecidif)
        return dict(
            dt_veg=dt_veg, t_veg_n=t_veg_n, del_=del_, efe=efe,
            wtg=wtg, wtl0=wtl0, wtg0=wtg0, wta0=wta0, wtga=wtga,
            wtal=wtal, wtgq=wtgq, wtalq=wtalq, wtlq0=wtlq0, wtaq0=wtaq0,
            wtgq0=wtgq0, qflx_tran_veg=qflx_tran_veg,
            qflx_evap_veg=qflx_evap_veg, eflx_sh_veg=eflx_sh_veg)

    def _boost(b):
        """Soybean btran boost, applied twice (sun then shade) exactly
        as the reference's in-place mutation sequence does."""
        if isinstance(soybean, bool):
            b_sun = b
            if soybean:
                b_sun = jnp.minimum(1.0, b_sun * 1.25)
            b_sha = b_sun
            if soybean:
                b_sha = jnp.minimum(1.0, b_sha * 1.25)
            return b_sun, b_sha
        bs = jnp.where(soybean, jnp.minimum(1.0, b * 1.25), b)
        return bs, jnp.where(soybean, jnp.minimum(1.0, bs * 1.25), bs)

    z = jnp.zeros_like(t_grnd)
    ci_carry0 = (ci_prev if (warm_start and ci_prev is not None)
                 else jnp.concatenate([z, z]))
    s0 = _LoopState(
        t_veg=t_veg, el=el, qsatl=qsatl, qsatldT=qsatldT, taf=taf, qaf=qaf,
        um=um, obu=obu, delq=delq, btran=btran, del_=z, efeb=z, obuold=z,
        nmozsgn=jnp.zeros_like(snl), itlef=jnp.zeros_like(snl),
        stop=~veg, ci=ci_carry0,
        psn_iters=jnp.zeros((2 * z.shape[0],), jnp.int32),
        p_t_veg=t_veg, p_qsatl=qsatl, p_qsatldT=qsatldT, p_taf=taf,
        p_qaf=qaf, p_um=um, p_obu=obu, p_delq=delq, p_efeb=z,
        p_rssun=z, p_rssha=z)

    def cond(s: _LoopState):
        return jnp.any((s.itlef <= itmax) & ~s.stop)

    def body(s: _LoopState):
        act = (s.itlef <= itmax) & ~s.stop

        c1 = _chain1(s.um, s.obu, s.taf)
        ustar, temp1, temp2, rah0, raw0, rb, uaf, rah1, raw1 = c1
        del2 = s.del_

        svpts = s.el
        eah = forc_pbot * s.qaf / 0.622

        # sun and shade photosynthesis solves are independent per-column
        # problems with the same scalar traits: stack them into one
        # [2*ncol] batch so the hybrid secant/Brent while_loops run once
        # per outer iteration instead of twice (per-column iteration
        # sequences — and hence results — are unchanged).
        btran_sun, btran_sha = _boost(s.btran)
        btran_i = btran_sha

        def cat(a, b):
            return jnp.concatenate([a, b], axis=0)

        def cat2(a):
            return jnp.concatenate([a, a], axis=0)

        psn_both = psn.photosynthesis(
            p2, cat2(nrad), cat2(forc_pbot), cat2(s.t_veg), cat2(t10),
            cat2(svpts), cat2(eah), cat2(forc_po2), cat2(forc_pco2),
            cat2(rb), cat(btran_sun, btran_sha), cat2(dayl_factor),
            cat2(thm), cat2(tlai_z), cat(vcmaxcintsun, vcmaxcintsha),
            cat(parsun_z, parsha_z), cat(laisun_z, laisha_z), cat2(act),
            mode=psn_mode, ci_init=s.ci if warm_start else None)
        ncol = s.t_veg.shape[0]
        rssun = psn_both.rs[:ncol]
        rssha = psn_both.rs[ncol:]

        c2 = _chain2(c1, s.t_veg, s.qsatl, s.qsatldT, s.qaf, s.delq,
                     s.efeb, btran_i, rssun, rssha)
        dt_veg, t_veg_n, del_, efe = (c2["dt_veg"], c2["t_veg_n"],
                                      c2["del_"], c2["efe"])

        qs = qsat(t_veg_n, forc_pbot)
        el_n, qsatl_n, qsatldT_n = qs.es, qs.qs, qs.qsdT

        taf_n = c2["wtg0"] * t_grnd + c2["wta0"] * thm \
            + c2["wtl0"] * t_veg_n
        qaf_n = c2["wtlq0"] * qsatl_n + c2["wtgq0"] * qg \
            + forc_q * c2["wtaq0"]
        dth = thm - taf_n
        dqh = forc_q - qaf_n
        delq_n = c2["wtalq"] * qg - c2["wtlq0"] * qsatl_n \
            - c2["wtaq0"] * forc_q
        tstar = temp1 * dth
        qstar = temp2 * dqh
        thvstar = tstar * (1.0 + 0.61 * forc_q) + 0.61 * forc_th * qstar
        zeta = zldis * c.VKC * c.GRAV * thvstar / (ustar ** 2.0 * thv)
        stab = zeta >= 0.0
        zeta = jnp.where(stab, jnp.clip(zeta, 0.01, 2.0),
                         jnp.clip(zeta, -100.0, -0.01))
        wc = beta * jnp.maximum(
            -c.GRAV * ustar * thvstar * zii / thv, 0.0) ** 0.333
        um_n = jnp.where(stab, jnp.maximum(ur, 0.1),
                         jnp.sqrt(ur * ur + wc * wc))
        obu_n = zldis / zeta
        flip = s.obuold * obu_n < 0.0
        nmozsgn = s.nmozsgn + flip.astype(s.nmozsgn.dtype)
        obu_n = jnp.where(nmozsgn >= 4, zldis / (-0.01), obu_n)
        obuold = obu_n

        itlef = s.itlef + 1
        past_min = itlef > itmin
        dele = jnp.abs(efe - s.efeb)
        efeb_n = jnp.where(past_min, efe, s.efeb)
        det = jnp.maximum(del_, del2)
        stop_n = s.stop | (past_min & (det < dtmin) & (dele < dlemin))

        def sel(new, old):
            return jnp.where(act, new, old)

        return _LoopState(
            t_veg=sel(t_veg_n, s.t_veg), el=sel(el_n, s.el),
            qsatl=sel(qsatl_n, s.qsatl), qsatldT=sel(qsatldT_n, s.qsatldT),
            taf=sel(taf_n, s.taf), qaf=sel(qaf_n, s.qaf),
            um=sel(um_n, s.um), obu=sel(obu_n, s.obu),
            delq=sel(delq_n, s.delq), btran=sel(btran_i, s.btran),
            del_=sel(del_, s.del_),
            efeb=sel(efeb_n, s.efeb), obuold=sel(obuold, s.obuold),
            nmozsgn=jnp.where(act, nmozsgn, s.nmozsgn),
            itlef=jnp.where(act, itlef, s.itlef),
            stop=jnp.where(act, stop_n, s.stop),
            ci=jnp.where(cat2(act) & (psn_both.ci_root > 0.0),
                         psn_both.ci_root, s.ci),
            psn_iters=s.psn_iters + jnp.where(cat2(act),
                                              psn_both.ci_iters, 0),
            # entry snapshots of the final ACTIVE iteration
            p_t_veg=sel(s.t_veg, s.p_t_veg),
            p_qsatl=sel(s.qsatl, s.p_qsatl),
            p_qsatldT=sel(s.qsatldT, s.p_qsatldT),
            p_taf=sel(s.taf, s.p_taf), p_qaf=sel(s.qaf, s.p_qaf),
            p_um=sel(s.um, s.p_um), p_obu=sel(s.obu, s.p_obu),
            p_delq=sel(s.delq, s.p_delq), p_efeb=sel(s.efeb, s.p_efeb),
            p_rssun=sel(rssun, s.p_rssun), p_rssha=sel(rssha, s.p_rssha))

    s = jax.lax.while_loop(cond, body, s0)

    # recompute the final-iteration outputs ONCE from the entry
    # snapshots (identical arithmetic to the body via _chain1/_chain2);
    # bare columns (never active) keep the r3 behavior: zeros
    c1f = _chain1(s.p_um, s.p_obu, s.p_taf)
    temp12m = fv.friction_velocity_temp2m(s.p_obu, z0hv)
    temp22m = fv.friction_velocity_humidity2m(s.p_obu, z0hv, z0qv, temp12m)
    c2f = _chain2(c1f, s.p_t_veg, s.p_qsatl, s.p_qsatldT, s.p_qaf,
                  s.p_delq, s.p_efeb, s.btran, s.p_rssun, s.p_rssha)

    def out(x):
        return jnp.where(veg, x, 0.0)

    return StabilityOut(
        btran=s.btran, qflx_tran_veg=out(c2f["qflx_tran_veg"]),
        qflx_evap_veg=out(c2f["qflx_evap_veg"]),
        eflx_sh_veg=out(c2f["eflx_sh_veg"]),
        wtg=out(c2f["wtg"]), wtl0=out(c2f["wtl0"]), wta0=out(c2f["wta0"]),
        wtal=out(c2f["wtal"]), el=s.el,
        qsatl=s.qsatl, qsatldT=s.qsatldT, taf=s.taf, qaf=s.qaf, um=s.um,
        dth=out(thm - s.taf), dqh=out(forc_q - s.qaf), obu=s.obu,
        temp1=out(c1f[1]), temp2=out(c1f[2]),
        temp12m=out(temp12m), temp22m=out(temp22m),
        tlbef=out(s.p_t_veg), delq=s.delq,
        dt_veg=out(c2f["dt_veg"]), t_veg=s.t_veg, itlef=s.itlef,
        wtgq=out(c2f["wtgq"]), wtalq=out(c2f["wtalq"]),
        wtlq0=out(c2f["wtlq0"]), wtaq0=out(c2f["wtaq0"]), ci=s.ci,
        psn_iters=s.psn_iters)


class ComputeFluxOut(NamedTuple):
    h2ocan: jnp.ndarray
    eflx_sh_grnd: jnp.ndarray
    eflx_sh_snow: jnp.ndarray
    eflx_sh_soil: jnp.ndarray
    eflx_sh_h2osfc: jnp.ndarray
    qflx_evap_soi: jnp.ndarray
    qflx_ev_snow: jnp.ndarray
    qflx_ev_soil: jnp.ndarray
    qflx_ev_h2osfc: jnp.ndarray
    dlrad: jnp.ndarray
    ulrad: jnp.ndarray
    cgrnds: jnp.ndarray
    cgrndl: jnp.ndarray
    cgrnd: jnp.ndarray
    t_ref2m: jnp.ndarray
    q_ref2m: jnp.ndarray
    rh_ref2m: jnp.ndarray


def compute_flux(land: c.LandType, dtime, snl, frac_veg_nosno, frac_sno,
                 t_soisno, frac_h2osfc, t_h2osfc, sabv, qg_snow, qg_soil,
                 qg_h2osfc, dqgdT, htvp, wtg, wtl0, wta0, wtal, air, bir,
                 cir, qsatl, qsatldT, dth, dqh, temp1, temp2, temp12m,
                 temp22m, tlbef, delq, dt_veg, t_veg, t_grnd, forc_pbot,
                 qflx_tran_veg, qflx_evap_veg, eflx_sh_veg, forc_q, forc_rho,
                 thm, emv, emg, forc_lwrad, wtgq, wtalq, wtlq0, wtaq0,
                 h2ocan, eflx_sh_grnd, eflx_sh_snow, eflx_sh_soil,
                 eflx_sh_h2osfc, qflx_evap_soi, qflx_ev_snow, qflx_ev_soil,
                 qflx_ev_h2osfc, dlrad, ulrad, t_ref2m, q_ref2m,
                 rh_ref2m) -> ComputeFluxOut:
    """Post-iteration ground↔canopy fluxes, longwave, flux derivatives, and
    2m diagnostics.

    Reference: ``canopy_fluxes_impl.hh:454-540`` (``compute_flux``).
    Trailing arguments carry pass-through values for bare columns.
    """
    veg = frac_veg_nosno != 0
    zero = jnp.zeros_like(t_grnd)

    t_top_sno = take_layer(t_soisno, c.NLEVSNO - snl)
    t_top_soil = t_soisno[:, c.NLEVSNO]

    lw_grnd = (frac_sno * t_top_sno ** 4.0
               + (1.0 - frac_sno - frac_h2osfc) * t_top_soil ** 4.0
               + frac_h2osfc * t_h2osfc ** 4.0)

    delt = wtal * t_grnd - wtl0 * t_veg - wta0 * thm
    sh_grnd = c.CPAIR * forc_rho * wtg * delt
    sh_snow = c.CPAIR * forc_rho * wtg * (
        wtal * t_top_sno - wtl0 * t_veg - wta0 * thm)
    sh_soil = c.CPAIR * forc_rho * wtg * (
        wtal * t_top_soil - wtl0 * t_veg - wta0 * thm)
    sh_h2osfc = c.CPAIR * forc_rho * wtg * (
        wtal * t_h2osfc - wtl0 * t_veg - wta0 * thm)
    ev_soi = forc_rho * wtgq * delq
    ev_snow = forc_rho * wtgq * (
        wtalq * qg_snow - wtlq0 * qsatl - wtaq0 * forc_q)
    ev_soil = forc_rho * wtgq * (
        wtalq * qg_soil - wtlq0 * qsatl - wtaq0 * forc_q)
    ev_h2osfc = forc_rho * wtgq * (
        wtalq * qg_h2osfc - wtlq0 * qsatl - wtaq0 * forc_q)

    t2m = thm + temp1 * dth * (1.0 / temp12m - 1.0 / temp1)
    q2m = forc_q + temp2 * dqh * (1.0 / temp22m - 1.0 / temp2)
    qs2m = qsat(t2m, forc_pbot)
    rh2m = jnp.minimum(100.0, q2m / qs2m.qs * 100.0)

    dlrad_n = ((1.0 - emv) * emg * forc_lwrad
               + emv * emg * c.STEBOL * tlbef ** 3.0
               * (tlbef + 4.0 * dt_veg))
    ulrad_n = ((1.0 - emg) * (1.0 - emv) * (1.0 - emv) * forc_lwrad
               + emv * (1.0 + (1.0 - emg) * (1.0 - emv)) * c.STEBOL
               * tlbef ** 3.0 * (tlbef + 4.0 * dt_veg)
               + emg * (1.0 - emv) * c.STEBOL * lw_grnd)

    cgrnds_n = c.CPAIR * forc_rho * wtg * wtal
    cgrndl_n = forc_rho * wtgq * wtalq * dqgdT
    cgrnd_n = cgrnds_n + cgrndl_n * htvp

    h2ocan_n = jnp.maximum(
        0.0, h2ocan + (qflx_tran_veg - qflx_evap_veg) * dtime)

    return ComputeFluxOut(
        h2ocan=jnp.where(veg, h2ocan_n, h2ocan),
        eflx_sh_grnd=jnp.where(veg, sh_grnd, eflx_sh_grnd),
        eflx_sh_snow=jnp.where(veg, sh_snow, eflx_sh_snow),
        eflx_sh_soil=jnp.where(veg, sh_soil, eflx_sh_soil),
        eflx_sh_h2osfc=jnp.where(veg, sh_h2osfc, eflx_sh_h2osfc),
        qflx_evap_soi=jnp.where(veg, ev_soi, qflx_evap_soi),
        qflx_ev_snow=jnp.where(veg, ev_snow, qflx_ev_snow),
        qflx_ev_soil=jnp.where(veg, ev_soil, qflx_ev_soil),
        qflx_ev_h2osfc=jnp.where(veg, ev_h2osfc, qflx_ev_h2osfc),
        dlrad=jnp.where(veg, dlrad_n, dlrad),
        ulrad=jnp.where(veg, ulrad_n, ulrad),
        cgrnds=jnp.where(veg, cgrnds_n, zero),
        cgrndl=jnp.where(veg, cgrndl_n, zero),
        cgrnd=jnp.where(veg, cgrnd_n, zero),
        t_ref2m=jnp.where(veg, t2m, t_ref2m),
        q_ref2m=jnp.where(veg, q2m, q_ref2m),
        rh_ref2m=jnp.where(veg, rh2m, rh_ref2m))
