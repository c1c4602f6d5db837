"""Farquhar C3/C4 photosynthesis with Ball-Berry stomatal conductance —
batched over columns.

TPU-native rebuild of
``/root/reference/src/physics/photosynthesis_impl.hh:5-651`` (from ELM's
PhotosynthesisMod.F90).

The per-column hybrid secant + Brent root solve for intracellular CO2
(``hybrid``/``brent``, reference lines 395-620) is reproduced
*iteration-for-iteration* as masked ``lax.while_loop``s: every column runs
the same sequence of f-evaluations the reference's scalar control flow
would produce, with converged columns frozen by masking, so results match
the reference bit-closely.  The sun/shade big-leaf configuration
(nlevcan == 1) is the compiled path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c

_THETA_IP = 0.95
_FNPS = 0.15
_THETA_PSII = 0.7
_SCO = 0.5 * 0.209 / (42.75 / 1.e06)
_RSMAX0 = 2.0e4


class PFTPsnParams(NamedTuple):
    """Photosynthesis PFT traits (reference ``PFTDataPSN``,
    ``pft_data.h:20-26`` / ``pft_data_impl.hh:60-96``).

    Fields are plain floats for a homogeneous (single-PFT) domain — they
    fold to compile-time constants — or ``[ncol]`` arrays for a
    heterogeneous domain (the TPU analog of the reference's per-cell
    ``get_pft_psn(psn_pft[c], vtype[c])`` extraction,
    ``initialize_elm_kokkos.cc:374-431``)."""
    fnr: float
    act25: float
    kcha: float
    koha: float
    cpha: float
    vcmaxha: float
    jmaxha: float
    tpuha: float
    lmrha: float
    vcmaxhd: float
    jmaxhd: float
    tpuhd: float
    lmrhd: float
    lmrse: float
    qe: float
    theta_cj: float
    bbbopt: float
    mbbopt: float
    c3psn: float
    slatop: float
    leafcn: float
    flnr: float
    fnitr: float
    dleaf: float
    smpso: float
    smpsc: float
    tc_stress: float


def ft(tl, ha):
    """Arrhenius temperature response.  Reference: lines 622-625."""
    return jnp.exp(ha / (c.RGAS * 1.0e-3 * (c.TFRZ + 25.0))
                   * (1.0 - (c.TFRZ + 25.0) / tl))


def fth(tl, hd, se, scale):
    """High-temperature inhibition.  Reference: lines 627-630."""
    return scale / (1.0 + jnp.exp((-hd + se * tl) / (c.RGAS * 1.0e-3 * tl)))


def fth25(hd, se):
    """Reference: lines 632-635."""
    return 1.0 + jnp.exp((-hd + se * (c.TFRZ + 25.0))
                         / (c.RGAS * 1.0e-3 * (c.TFRZ + 25.0)))


def quadratic_roots(a, b, c_):
    """Numerically stable quadratic roots.  Reference: lines 285-302."""
    disc = jnp.sqrt(b * b - 4.0 * a * c_)
    q = jnp.where(b >= 0.0, -0.5 * (b + disc), -0.5 * (b - disc))
    r1 = q / a
    r2 = jnp.where(q != 0.0, c_ / jnp.where(q != 0.0, q, 1.0), 1.0e36)
    return r1, r2


def psn_mode_of(p: PFTPsnParams) -> str:
    """Static photosynthesis pathway for a trait set: ``"c3"``, ``"c4"``,
    or ``"mixed"`` (both pathways compiled, selected per column by
    ``c3psn``).  Must be decided from *concrete* traits (host side); traced
    traits require the caller to pass the mode explicitly."""
    v = p.c3psn
    if isinstance(v, jax.core.Tracer):
        raise ValueError(
            "c3psn is traced; pass psn_mode explicitly (it is a static "
            "compilation choice, decided host-side from concrete traits)")
    arr = np.asarray(v)
    if np.all(arr == arr.flat[0]):
        return "c3" if round(float(arr.flat[0])) == 1 else "c4"
    return "mixed"


def tile_traits(p: PFTPsnParams, reps: int) -> PFTPsnParams:
    """Tile per-column trait arrays ``reps`` times along the column axis
    (for stacked sun+shade batches); scalar traits pass through."""
    def f(v):
        if getattr(v, "ndim", 0) >= 1:
            return jnp.tile(v, reps)
        return v
    return PFTPsnParams(*(f(v) for v in p))


class CiEnv(NamedTuple):
    """Per-column environment for the ci residual function.  The trailing
    four fields carry the PFT traits the residual consumes, broadcast per
    column, so the solver is closed over data — no static trait capture,
    heterogeneous batches included."""
    gb_mol: jnp.ndarray
    je: jnp.ndarray
    cair: jnp.ndarray
    oair: jnp.ndarray
    lmr_z: jnp.ndarray
    par_z: jnp.ndarray
    rh_can: jnp.ndarray
    vcmax_z: jnp.ndarray
    forc_pbot: jnp.ndarray
    cp: jnp.ndarray
    kc: jnp.ndarray
    ko: jnp.ndarray
    tpu_z: jnp.ndarray
    kp_z: jnp.ndarray
    bbb: jnp.ndarray
    qe: jnp.ndarray        # PFT trait (c4 light-response slope)
    theta_cj: jnp.ndarray  # PFT trait (colimitation shape)
    mbbopt: jnp.ndarray    # PFT trait (Ball-Berry slope)
    c3frac: jnp.ndarray    # c3psn per column (used when mode == "mixed")


class PsnOut(NamedTuple):
    gs_mol: jnp.ndarray
    ac: jnp.ndarray
    aj: jnp.ndarray
    ap: jnp.ndarray
    ag: jnp.ndarray
    an: jnp.ndarray


def _sel_out(mask, new: PsnOut, old: PsnOut) -> PsnOut:
    return PsnOut(*(jnp.where(mask, n, o) for n, o in zip(new, old)))


def ci_func(ci, prev: PsnOut, env: CiEnv,
            mode: str) -> tuple[jnp.ndarray, PsnOut]:
    """Residual f(ci) = ci - (ca - an*(1.4gs+1.6gb)/(gb*gs)*patm) and the
    photosynthesis rates/conductance at this ci.

    Reference: lines 307-390 (``ci_func``).  On ``an < 0`` the reference
    returns early with fval = 0 and leaves gs_mol untouched — reproduced by
    carrying the previous gs_mol.  ``mode`` is a static pathway selector:
    pure batches compile one branch; ``"mixed"`` compiles both and selects
    per column by ``env.c3frac`` (scalar math — both branches are cheap).
    """
    if mode != "c4":
        ac3 = (env.vcmax_z * jnp.maximum(ci - env.cp, 0.0)
               / (ci + env.kc * (1.0 + env.oair / env.ko)))
        aj3 = (env.je * jnp.maximum(ci - env.cp, 0.0)
               / (4.0 * ci + 8.0 * env.cp))
        ap3 = 3.0 * env.tpu_z
    if mode != "c3":
        ac4 = env.vcmax_z
        aj4 = env.qe * env.par_z * 4.6
        ap4 = env.kp_z * jnp.maximum(ci, 0.0) / env.forc_pbot
    if mode == "c3":
        ac, aj, ap = ac3, aj3, ap3
    elif mode == "c4":
        ac, aj, ap = ac4, aj4, ap4
    else:
        isc3 = env.c3frac >= 0.5
        ac = jnp.where(isc3, ac3, ac4)
        aj = jnp.where(isc3, aj3, aj4)
        ap = jnp.where(isc3, ap3, ap4)

    r1, r2 = quadratic_roots(
        jnp.broadcast_to(env.theta_cj, ac.shape), -(ac + aj), ac * aj)
    ai = jnp.minimum(r1, r2)
    r1, r2 = quadratic_roots(
        jnp.full_like(ac, _THETA_IP), -(ai + ap), ai * ap)
    ag = jnp.minimum(r1, r2)
    an = ag - env.lmr_z

    neg = an < 0.0
    cs = jnp.maximum(env.cair - 1.4 / env.gb_mol * an * env.forc_pbot, 1.e-6)
    r1, r2 = quadratic_roots(
        cs, cs * (env.gb_mol - env.bbb) - env.mbbopt * an * env.forc_pbot,
        -env.gb_mol * (cs * env.bbb
                       + env.mbbopt * an * env.forc_pbot * env.rh_can))
    gs_new = jnp.maximum(r1, r2)
    gs_mol = jnp.where(neg, prev.gs_mol, gs_new)
    gs_safe = jnp.where(gs_mol != 0.0, gs_mol, 1.0)
    fval = jnp.where(
        neg, 0.0,
        ci - env.cair + an * env.forc_pbot
        * (1.4 * gs_mol + 1.6 * env.gb_mol) / (env.gb_mol * gs_safe))
    return fval, PsnOut(gs_mol, ac, aj, ap, ag, an)


class _SecantState(NamedTuple):
    x0: jnp.ndarray
    x1: jnp.ndarray
    f0: jnp.ndarray
    f1: jnp.ndarray
    minx: jnp.ndarray
    minf: jnp.ndarray
    out: PsnOut
    done: jnp.ndarray
    over: jnp.ndarray
    brent: jnp.ndarray
    ba: jnp.ndarray
    bb: jnp.ndarray
    bfa: jnp.ndarray
    bfb: jnp.ndarray
    btol: jnp.ndarray
    xfin: jnp.ndarray
    it: jnp.ndarray


def hybrid_solve(x0_init, env: CiEnv, mode: str, enabled,
                 out_init: PsnOut):
    """Masked-batch port of ``hybrid`` (lines 516-620) + ``brent``
    (lines 395-511).  Returns (ci, PsnOut).

    One ``lax.while_loop`` for all callers and dtypes: a round-1
    experiment that replaced this with a bounded unrolled ``fori_loop``
    (commit 4c9d210) produced differently-fused arithmetic whose rounding
    diverged by ~1e-4 after 40 secant iterations, and regressed the f64
    step ~21%.  One loop, one compilation, bit-exact everywhere.
    """
    eps, eps1, itmax = 1.0e-2, 1.0e-4, 40
    EPS_B, ITMAX_B = 1.0e-2, 20

    f0, o = ci_func(x0_init, out_init, env, mode)
    out = _sel_out(enabled, o, out_init)
    done = (~enabled) | (f0 == 0.0)
    xfin = x0_init
    minx, minf = x0_init, f0

    x1 = x0_init * 0.99
    f1, o = ci_func(x1, out, env, mode)
    out = _sel_out(~done, o, out)
    newly = (~done) & (f1 == 0.0)
    xfin = jnp.where(newly, x1, xfin)
    done = done | newly
    upd = (~done) & (f1 < minf)
    minx = jnp.where(upd, x1, minx)
    minf = jnp.where(upd, f1, minf)

    zeros = jnp.zeros_like(x0_init)
    falsev = jnp.zeros_like(done)
    s0 = _SecantState(x0_init, x1, f0, f1, minx, minf, out, done, falsev,
                      falsev, zeros, zeros, zeros, zeros, zeros, xfin,
                      jnp.zeros_like(x0_init, dtype=jnp.int32))

    def body(s: _SecantState):
        act = ~s.done & ~s.brent
        it = s.it + act.astype(jnp.int32)
        den = s.f1 - s.f0
        dx = -s.f1 * (s.x1 - s.x0) / jnp.where(den != 0.0, den, 1.0)
        x = s.x1 + dx
        tol = jnp.abs(x) * eps
        conv = act & (jnp.abs(dx) < tol)
        xfin = jnp.where(conv, x, s.xfin)
        done = s.done | conv
        act2 = act & ~conv
        x0n = jnp.where(act2, s.x1, s.x0)
        f0n = jnp.where(act2, s.f1, s.f0)
        x1n = jnp.where(act2, x, s.x1)
        f1e, o2 = ci_func(x1n, s.out, env, mode)
        out = _sel_out(act2, o2, s.out)
        f1n = jnp.where(act2, f1e, s.f1)
        updm = act2 & (f1n < s.minf)
        minx = jnp.where(updm, x1n, s.minx)
        minf = jnp.where(updm, f1n, s.minf)
        close = act2 & (jnp.abs(f1n) <= eps1)
        xfin = jnp.where(close, x1n, xfin)
        done = done | close
        act3 = act2 & ~close
        trig = act3 & (f1n * f0n < 0.0)
        brent = s.brent | trig
        ba = jnp.where(trig, x0n, s.ba)
        bb = jnp.where(trig, x1n, s.bb)
        bfa = jnp.where(trig, f0n, s.bfa)
        bfb = jnp.where(trig, f1n, s.bfb)
        btol = jnp.where(trig, tol, s.btol)
        act4 = act3 & ~trig
        overn = act4 & (it > itmax)
        over = s.over | overn
        # reference: on iteration overflow, x0 keeps the post-shift value
        xfin = jnp.where(overn, x0n, xfin)
        done = done | overn
        return _SecantState(x0n, x1n, f0n, f1n, minx, minf, out, done, over,
                            brent, ba, bb, bfa, bfb, btol, xfin, it)

    s = jax.lax.while_loop(lambda s: jnp.any(~s.done & ~s.brent),
                           body, s0)

    # overflow columns: final evaluation at the minimum-f point (line 615)
    _, o_over = ci_func(s.minx, s.out, env, mode)
    out = _sel_out(s.over, o_over, s.out)

    # ---- Brent phase for columns that bracketed a root ----------------------
    class _B(NamedTuple):
        a: jnp.ndarray
        b: jnp.ndarray
        fa: jnp.ndarray
        fb: jnp.ndarray
        cc: jnp.ndarray
        fc: jnp.ndarray
        d: jnp.ndarray
        e: jnp.ndarray
        out: PsnOut
        done: jnp.ndarray
        xfin: jnp.ndarray
        it: jnp.ndarray

    b0 = _B(s.ba, s.bb, s.bfa, s.bfb, s.bb, s.bfb, zeros, zeros, out,
            ~s.brent, s.xfin, jnp.int32(0))

    def bcond(b: _B):
        return jnp.any(~b.done) & (b.it != ITMAX_B)

    def bbody(b: _B):
        act = ~b.done
        it = b.it + 1
        cond1 = act & (((b.fb > 0.0) & (b.fc > 0.0))
                       | ((b.fb < 0.0) & (b.fc < 0.0)))
        cc = jnp.where(cond1, b.a, b.cc)
        fc = jnp.where(cond1, b.fa, b.fc)
        d = jnp.where(cond1, b.b - b.a, b.d)
        e = jnp.where(cond1, b.b - b.a, b.e)
        cond2 = act & (jnp.abs(fc) < jnp.abs(b.fb))
        a = jnp.where(cond2, b.b, b.a)
        bb_ = jnp.where(cond2, cc, b.b)
        ccn = jnp.where(cond2, a, cc)
        fa = jnp.where(cond2, b.fb, b.fa)
        fb = jnp.where(cond2, fc, b.fb)
        fcn = jnp.where(cond2, fa, fc)
        tol1 = 2.0 * EPS_B * jnp.abs(bb_) + 0.5 * s.btol
        xm = 0.5 * (ccn - bb_)
        convb = act & ((jnp.abs(xm) <= tol1) | (fb == 0.0))
        xfin = jnp.where(convb, bb_, b.xfin)
        done = b.done | convb
        act2 = act & ~convb

        interp_ok = (jnp.abs(e) >= tol1) & (jnp.abs(fa) > jnp.abs(fb))
        sr = fb / jnp.where(fa != 0.0, fa, 1.0)
        aeqc = a == ccn
        p1 = 2.0 * xm * sr
        q1 = 1.0 - sr
        fcs = jnp.where(fcn != 0.0, fcn, 1.0)
        q2 = fa / fcs
        r2 = fb / fcs
        p2 = sr * (2.0 * xm * q2 * (q2 - r2) - (bb_ - a) * (r2 - 1.0))
        q2b = (q2 - 1.0) * (r2 - 1.0) * (sr - 1.0)
        pp = jnp.where(aeqc, p1, p2)
        qq = jnp.where(aeqc, q1, q2b)
        qq = jnp.where(pp > 0.0, -qq, qq)
        pp = jnp.abs(pp)
        accept = interp_ok & (
            2.0 * pp < jnp.minimum(3.0 * xm * qq - jnp.abs(tol1 * qq),
                                   jnp.abs(e * qq)))
        d_int = pp / jnp.where(qq != 0.0, qq, 1.0)
        d_next = jnp.where(accept, d_int, xm)
        e_next = jnp.where(accept, d, xm)

        a_next = bb_
        fa_next = fb
        # copysign(tol1, xm) without the s64 bitcast (unsupported by the
        # TPU x64 rewriter); tol1 >= 0 by construction
        signed_tol = jnp.where(xm >= 0.0, tol1, -tol1)
        step = jnp.where(jnp.abs(d_next) > tol1, d_next, signed_tol)
        b_next = bb_ + step

        fbe, ob = ci_func(b_next, b.out, env, mode)
        outn = _sel_out(act2, ob, b.out)
        fb_next = jnp.where(act2, fbe, fb)
        hit = act2 & (fb_next == 0.0)
        xfin = jnp.where(hit, b_next, xfin)
        done = done | hit

        return _B(jnp.where(act2, a_next, a), jnp.where(act2, b_next, bb_),
                  jnp.where(act2, fa_next, fa), jnp.where(act2, fb_next, fb),
                  jnp.where(act2, ccn, ccn), jnp.where(act2, fcn, fcn),
                  jnp.where(act2, d_next, d), jnp.where(act2, e_next, e),
                  outn, done, xfin, it)

    bf = jax.lax.while_loop(bcond, bbody, b0)
    # columns that exhausted Brent's ITMAX: x = b (line 510)
    exhausted = s.brent & ~bf.done
    xfin = jnp.where(exhausted, bf.b, bf.xfin)
    # per-column secant iteration count (observability for the warm-start
    # perf mode; the brent loop-level count is not per-column)
    return xfin, bf.out, s.it


class PhotosynthesisOut(NamedTuple):
    rs: jnp.ndarray      # canopy stomatal resistance (s/m)
    ci_z: jnp.ndarray    # [ncol, nlevcan]
    ci_root: jnp.ndarray  # hybrid-solve root [ncol]; warm-start carry
    ci_iters: jnp.ndarray  # i32 [ncol] secant iterations used


def photosynthesis(p: PFTPsnParams, nrad, forc_pbot, t_veg, t10, esat_tv,
                   eair, oair, cair, rb, btran, dayl_factor, thm, tlai_z,
                   vcmaxcint, par_z, lai_z, enabled,
                   mode: str | None = None,
                   ci_init=None) -> PhotosynthesisOut:
    """Leaf photosynthesis + stomatal resistance for one canopy phase
    (sun or shade).  nlevcan == 1 big-leaf path.

    Reference: lines 7-282 (``photosynthesis``).  ``enabled`` masks columns
    for which the result is used (inactive columns still compute but are
    numerically safe).  ``mode`` selects the compiled pathway ("c3"/"c4"/
    "mixed"); None derives it from concrete ``p.c3psn`` (homogeneous
    trait sets only).

    ``ci_init`` optionally warm-starts the hybrid secant/Brent ci solve:
    columns where it is positive and finite start from it instead of the
    reference's 0.7/0.4*cair cold guess (an opt-in perf mode — it changes
    the solver's iteration path, so the reference-exact default passes
    None; see canopy_fluxes.stability_iteration ``warm_start``).
    """
    assert c.NLEVCAN == 1
    if mode is None:
        mode = psn_mode_of(p)
    c3 = mode == "c3"
    mixed = mode == "mixed"
    if mixed:
        isc3 = jnp.asarray(p.c3psn) >= 0.5

    # squeeze the single canopy layer up front: carrying a trailing
    # [ncol, 1] through the iterative solvers makes XLA emit hundreds of
    # per-iteration slice/broadcast ops (values are unchanged)
    if vcmaxcint.ndim == 2:
        vcmaxcint = vcmaxcint[:, 0]
    if par_z.ndim == 2:
        par_z = par_z[:, 0]
    if lai_z.ndim == 2:
        lai_z = lai_z[:, 0]

    lnc = 1.0 / (p.slatop * p.leafcn)
    act25 = p.act25 * 1000.0 / 60.0
    vcmax25top = lnc * p.flnr * p.fnr * act25 * dayl_factor * p.fnitr
    t10c = jnp.clip(t10 - c.TFRZ, 11.0, 35.0)
    jmax25top = (2.59 - 0.035 * t10c) * vcmax25top
    tpu25top = 0.167 * vcmax25top
    kp25top = 20000.0 * vcmax25top

    if mixed:
        lmr25top = vcmax25top * jnp.where(isc3, 0.015, 0.025)
    elif c3:
        lmr25top = vcmax25top * 0.015
    else:
        lmr25top = vcmax25top * 0.025

    # single canopy layer (nrad == 1): nscaler = canopy-integrated factor
    nscaler = vcmaxcint
    lmr25 = lmr25top * nscaler
    if mode != "c4":
        lmrc = fth25(p.lmrhd, p.lmrse)
        lmr_z_c3 = lmr25 * ft(t_veg, p.lmrha) * fth(t_veg, p.lmrhd,
                                                    p.lmrse, lmrc)
    if mode != "c3":
        lmr_z_c4 = (lmr25 * 2.0 ** ((t_veg - (c.TFRZ + 25.0)) / 10.0)
                    / (1.0 + jnp.exp(1.3 * (t_veg - (c.TFRZ + 55.0)))))
    if c3:
        lmr_z = lmr_z_c3
    elif mixed:
        lmr_z = jnp.where(isc3, lmr_z_c3, lmr_z_c4)
    else:
        lmr_z = lmr_z_c4

    par0 = par_z
    day = par0 > 0.0
    vcmax25 = vcmax25top * nscaler
    jmax25 = jmax25top * nscaler
    tpu25 = tpu25top * nscaler
    kp25 = kp25top * nscaler
    vcmaxse = 668.39 - 1.07 * t10c
    jmaxse = 659.70 - 0.75 * t10c
    tpuse = vcmaxse
    vcmaxc = fth25(p.vcmaxhd, vcmaxse)
    jmaxc = fth25(p.jmaxhd, jmaxse)
    tpuc = fth25(p.tpuhd, tpuse)
    vcmax_z = vcmax25 * ft(t_veg, p.vcmaxha) * fth(t_veg, p.vcmaxhd, vcmaxse,
                                                   vcmaxc)
    jmax_z = jmax25 * ft(t_veg, p.jmaxha) * fth(t_veg, p.jmaxhd, jmaxse,
                                                jmaxc)
    tpu_z = tpu25 * ft(t_veg, p.tpuha) * fth(t_veg, p.tpuhd, tpuse, tpuc)
    if mode != "c3":
        vcmax_z_c4 = (vcmax25 * 2.0 ** ((t_veg - (c.TFRZ + 25.0)) / 10.0)
                      / (1.0 + jnp.exp(0.2 * ((c.TFRZ + 15.0) - t_veg)))
                      / (1.0 + jnp.exp(0.3 * (t_veg - (c.TFRZ + 40.0)))))
        vcmax_z = (jnp.where(isc3, vcmax_z, vcmax_z_c4) if mixed
                   else vcmax_z_c4)
    kp_z = kp25 * 2.0 ** ((t_veg - (c.TFRZ + 25.0)) / 10.0)
    vcmax_z = jnp.where(day, vcmax_z, 0.0)
    jmax_z = jnp.where(day, jmax_z, 0.0)
    tpu_z = jnp.where(day, tpu_z, 0.0)
    kp_z = jnp.where(day, kp_z, 0.0)

    vcmax_z = vcmax_z * btran
    lmr_z = lmr_z * btran

    cf = forc_pbot / (c.RGAS * 1.0e-3 * thm) * 1.e06
    gb = 1.0 / rb
    gb_mol = gb * cf
    bbb = jnp.maximum(p.bbbopt * btran, 1.0)

    kc25 = (404.9 / 1.e06) * forc_pbot
    ko25 = (278.4 / 1.e03) * forc_pbot
    cp25 = 0.5 * oair / _SCO
    kc = kc25 * ft(t_veg, p.kcha)
    ko = ko25 * ft(t_veg, p.koha)
    cp = cp25 * ft(t_veg, p.cpha)

    # night-time resistance
    rs_night = jnp.minimum(_RSMAX0, 1.0 / bbb * cf)

    # day-time: electron transport + hybrid ci solve
    ceair = jnp.minimum(eair, esat_tv)
    rh_can = ceair / esat_tv
    qabs = 0.5 * (1.0 - _FNPS) * par0 * 4.6
    r1, r2 = quadratic_roots(jnp.full_like(qabs, _THETA_PSII),
                             -(qabs + jmax_z), qabs * jmax_z)
    je = jnp.minimum(r1, r2)

    if mixed:
        ci0 = jnp.where(isc3, 0.7, 0.4) * cair
    else:
        ci0 = (0.7 if c3 else 0.4) * cair
    if ci_init is not None:
        ok = (ci_init > 0.0) & jnp.isfinite(ci_init)
        ci0 = jnp.where(ok, ci_init, ci0)

    def cc(v):
        return jnp.broadcast_to(jnp.asarray(v, cair.dtype), cair.shape)

    env = CiEnv(gb_mol, je, cair, oair, lmr_z, par0, rh_can, vcmax_z,
                forc_pbot, cp, kc, ko, tpu_z, kp_z, bbb,
                qe=cc(p.qe), theta_cj=cc(p.theta_cj), mbbopt=cc(p.mbbopt),
                c3frac=cc(p.c3psn))
    zero = jnp.zeros_like(cair)
    out0 = PsnOut(zero, zero, zero, zero, zero, zero)
    ci, out, ci_iters = hybrid_solve(ci0, env, mode, enabled & day, out0)

    gs_mol = jnp.where(out.an < 0.0, bbb, out.gs_mol)
    ci_day = (cair - out.an * forc_pbot
              * (1.4 * gs_mol + 1.6 * gb_mol)
              / (gb_mol * jnp.where(gs_mol != 0.0, gs_mol, 1.0)))
    gs = gs_mol / cf
    rs_day = jnp.minimum(1.0 / jnp.where(gs != 0.0, gs, 1.0), _RSMAX0)

    rs_z = jnp.where(day, rs_day, rs_night)
    ci_out = jnp.where(day, ci_day, 0.0)

    # canopy aggregation (single layer)
    lai0 = lai_z
    gscan = lai0 / (rb + rs_z)
    haslai = lai0 > 0.0
    rs = jnp.where(haslai,
                   lai0 / jnp.where(haslai, gscan, 1.0) - rb, 0.0)
    return PhotosynthesisOut(rs, ci_out[:, None],
                             jnp.where(day, ci, 0.0), ci_iters)
