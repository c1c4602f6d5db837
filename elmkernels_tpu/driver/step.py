"""The full land-surface water+energy timestep as one pure jitted function.

TPU-native replacement for the reference's ``ELMInterface::advance`` call
sequence (``/root/reference/driver/kokkos/elm_kokkos_interface.cc:268-322``
and the per-group ``*_kokkos.cc`` wrappers): the ~20 hand-sequenced Kokkos
kernel launches collapse into one traced function that XLA fuses.  Per-step
host work is reduced to assembling the raw forcing/phenology slices
(:class:`StepForcing`/:class:`StepPhenology`); time interpolation and all
physics run on device.

Call chain per step (reference ordering, SURVEY.md §3.2):
  forcing/phenology interp → init_timestep → fraction_wet →
  albedo+SNICAR → canopy_hydrology → surface_radiation →
  canopy_temperature → bareground_fluxes → canopy_fluxes →
  soil_temperature (CN penta solve + phase change) → snow_hydrology →
  surface_fluxes → conservation diagnostics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.data.state import (ModelParams, ModelState, StepForcing,
                                       StepPhenology)
from elmkernels_tpu.physics import (atm_physics as ap, bareground_fluxes as
                                    bg, canopy_fluxes as cfx,
                                    canopy_hydrology as chy,
                                    canopy_temperature as ct, conservation
                                    as ce, init_state as ini, phenology as
                                    ph, photosynthesis as psn,
                                    snow_hydrology as sh, snow_snicar as sn,
                                    soil_temperature as stp, soil_thermal
                                    as sth, solar, surface_albedo as sa,
                                    surface_fluxes as sf, surface_radiation
                                    as sr)
from elmkernels_tpu.physics.snow_snicar import SnicarTables
from elmkernels_tpu.physics.math_utils import take_layer


class StepDiagnostics(NamedTuple):
    """Per-step fluxes and conservation errors (the reference prints these;
    here they are returned for logging/assertion)."""
    eflx_sh_tot: jnp.ndarray
    eflx_lh_tot: jnp.ndarray
    eflx_soil_grnd: jnp.ndarray
    eflx_lwrad_out: jnp.ndarray
    eflx_lwrad_net: jnp.ndarray
    qflx_evap_tot: jnp.ndarray
    qflx_tran_veg: jnp.ndarray
    qflx_top_soil: jnp.ndarray
    qflx_rootsoi: jnp.ndarray
    # exchange fluxes handed to the (external) hydrology model — the
    # reference's ATS coupling surface (interface_data_transfer.hh)
    qflx_sl_top_soil: jnp.ndarray
    qflx_snow2topsoi: jnp.ndarray
    qflx_snwcp_liq: jnp.ndarray
    qflx_snwcp_ice: jnp.ndarray
    mflx_snowlyr: jnp.ndarray
    mflx_neg_snow: jnp.ndarray
    fsa: jnp.ndarray
    fsr: jnp.ndarray
    t_ref2m: jnp.ndarray
    errh2o: jnp.ndarray
    errh2o_led: jnp.ndarray  # closed ledger (see advance); ~0 when healthy
    errh2osno: jnp.ndarray
    # the reference's errh2osno re-timed to the fluxes snow_water
    # actually applied, masked to snl-steady columns (see advance) —
    # ~rounding when healthy, so a guardable invariant
    errh2osno_steady: jnp.ndarray
    errsol: jnp.ndarray
    errlon: jnp.ndarray
    errseb: jnp.ndarray
    errsoi: jnp.ndarray
    netrad: jnp.ndarray
    niters_canopy: jnp.ndarray  # canopy stability iterations used
    niters_ci: jnp.ndarray      # total inner ci secant iterations
    #                             (sun + shade, summed over the stability
    #                             loop) — the warm-start perf observable


class _SurfaceOut(NamedTuple):
    """Boundary between the surface phase (forcing/phenology interp,
    init_timestep, albedo+SNICAR, canopy hydrology, surface radiation,
    canopy temperature) and the flux/column phases.  Splitting ``advance``
    at these seams lets each phase compile standalone (XLA's optimization
    passes are superlinear in graph size — see BASELINE.md compile
    table); composing them in one jit is bit-identical to the former
    monolithic body."""
    forc_t: jnp.ndarray
    forc_th: jnp.ndarray
    forc_pbot: jnp.ndarray
    forc_q: jnp.ndarray
    forc_lwrad: jnp.ndarray
    forc_rain: jnp.ndarray
    forc_snow: jnp.ndarray
    forc_u: jnp.ndarray
    forc_v: jnp.ndarray
    forc_rho: jnp.ndarray
    forc_po2: jnp.ndarray
    forc_pco2: jnp.ndarray
    forc_solad: jnp.ndarray
    forc_solai: jnp.ndarray
    dayl: jnp.ndarray
    max_dayl: jnp.ndarray
    elai: jnp.ndarray
    esai: jnp.ndarray
    htop: jnp.ndarray
    frac_veg_nosno: jnp.ndarray
    do_capsnow: jnp.ndarray
    frac_iceold: jnp.ndarray
    swe_old: jnp.ndarray
    fwet: jnp.ndarray
    fdry: jnp.ndarray
    snl: jnp.ndarray
    dz: jnp.ndarray
    z: jnp.ndarray
    zi: jnp.ndarray
    snw_rds: jnp.ndarray
    h2osoi_liq: jnp.ndarray
    h2osoi_ice: jnp.ndarray
    t_soisno: jnp.ndarray
    snow_depth: jnp.ndarray
    h2osno: jnp.ndarray
    int_snow: jnp.ndarray
    frac_sno: jnp.ndarray
    frac_sno_eff: jnp.ndarray
    frac_h2osfc: jnp.ndarray
    h2osfc: jnp.ndarray
    h2ocan: jnp.ndarray
    t_grnd: jnp.ndarray
    tssbef: jnp.ndarray
    t_h2osfc_bef: jnp.ndarray
    soilbeta: jnp.ndarray
    begwb: jnp.ndarray
    h2osno_old: jnp.ndarray
    hum: tuple
    gp: tuple
    fhgt: tuple
    can: tuple
    ts: tuple
    sun: tuple
    tot: tuple
    sabg_lyr: jnp.ndarray
    fsr_out: jnp.ndarray
    gf: tuple


class _FluxOut(NamedTuple):
    """Boundary between the flux phase (bareground + canopy Monin-Obukhov
    iterations with photosynthesis) and the column phase (soil/snow
    temperature solve, snow hydrology, surface fluxes, conservation)."""
    rootr: jnp.ndarray
    cf_stab: tuple
    cf_cf: tuple
    t_veg: jnp.ndarray
    h2ocan: jnp.ndarray


def advance(land: c.LandType, psnveg: psn.PFTPsnParams,
            albveg: sa.PFTAlbParams, snicar: SnicarTables,
            params: ModelParams, state: ModelState, forcing: StepForcing,
            phen: StepPhenology, dtime: float,
            elm_correct_snow_aging: bool = False,
            psn_mode: str | None = None,
            qbot_is_rh: bool = False,
            mixed_radiation: bool = False,
            elm_correct_seb: bool = False,
            warm_start: bool = False,
            het_ltype: bool = False,
            mixed_canopy: bool = False
            ) -> tuple[ModelState, StepDiagnostics]:
    """One dtime step.  Pure function of (state, forcing) — jit/pjit it.

    Composes the three phases (surface → fluxes → column); jitting this
    composition fuses them into one executable, while the phases can
    also be compiled standalone (``tools/compile_breakdown.py``,
    ``CB_MODE=phases``) where XLA's superlinear optimization passes make
    three small compiles much cheaper than one big one.

    ``het_ltype=True`` swaps the static ``land.ltype`` for the per-column
    ``params.ltype`` array: every landunit-type branch then lowers to
    per-column masked selects (mixed soil/ice/wet batches in one domain —
    beyond the reference's one-LandType-per-domain placeholder,
    ``land_data.h:5-44``).

    ``elm_correct_snow_aging=True`` runs the full Flanner-Zender aging
    with ELM-proper clamping instead of the reference's double-clamp
    quirk (see snow_hydrology.snow_aging).  ``psn_mode`` is the static
    photosynthesis pathway ("c3"/"c4"/"mixed"); None derives it from the
    (then necessarily concrete) trait values.  ``warm_start=True``
    initializes the canopy stability / ci solvers from the previous
    step's converged obu/ci (opt-in perf mode: converged physics
    unchanged, iteration counts and last-ulp rounding differ from the
    reference-exact cold-start default)."""
    if het_ltype:
        import dataclasses
        land = dataclasses.replace(land, ltype=params.ltype)
    sfo = surface_phase(land, albveg, snicar, params, state, forcing, phen,
                        dtime, qbot_is_rh=qbot_is_rh,
                        mixed_radiation=mixed_radiation)
    fl = flux_phase(land, psnveg, params, state, sfo, dtime,
                    psn_mode=psn_mode, warm_start=warm_start,
                    mixed_canopy=mixed_canopy)
    return column_phase(land, params, state, forcing, sfo, fl, dtime,
                        elm_correct_snow_aging=elm_correct_snow_aging,
                        elm_correct_seb=elm_correct_seb)


def surface_phase(land: c.LandType, albveg: sa.PFTAlbParams,
                  snicar: SnicarTables, params: ModelParams,
                  state: ModelState, forcing: StepForcing,
                  phen: StepPhenology, dtime: float,
                  qbot_is_rh: bool = False,
                  mixed_radiation: bool = False) -> _SurfaceOut:
    """Forcing/phenology interp + init_timestep + albedo/SNICAR +
    canopy hydrology + surface radiation + canopy temperature."""
    s = state
    p = params
    dewmx = 0.1       # elm_kokkos_interface.cc:99
    oldfflag = 1      # elm_kokkos_interface.cc:101
    veg_active = jnp.ones_like(s.snl, dtype=bool)
    altmax_indx = jnp.full_like(s.snl, 5)
    altmax_lastyear_indx = jnp.zeros_like(s.snl)

    # =================== init_timestep (init_timestep_kokkos.cc) ==========
    # phenology (phenology_kokkos.cc -> ComputePhenology)
    vtype = p.vtype
    phout = ph.compute_phenology(
        phen.mlai[0], phen.mlai[1], phen.msai[0], phen.msai[1],
        phen.mhtop[0], phen.mhtop[1], phen.mhbot[0], phen.mhbot[1],
        s.snow_depth, s.frac_sno, vtype, phen.wt1, phen.wt2)
    elai, esai = phout.elai, phout.esai
    htop = phout.htop
    tlai, tsai = phout.tlai, phout.tsai

    # atm forcing interpolation (atm_forcing_kokkos.cc get_forcing)
    forc_t, forc_th = ap.process_tbot(forcing.wt1, forcing.wt2,
                                      forcing.tbot[0], forcing.tbot[1])
    forc_pbot = ap.process_pbot(forcing.wt1, forcing.wt2, forcing.pbot[0],
                                forcing.pbot[1])
    forc_q = ap.process_qbot(forcing.wt1, forcing.wt2, forcing.qbot[0],
                             forcing.qbot[1], forc_t, forc_pbot,
                             is_rh=qbot_is_rh)
    forc_lwrad = ap.process_flds(forcing.wt1, forcing.wt2, forcing.flds[0],
                                 forcing.flds[1], forc_pbot, forc_q, forc_t)
    # solar geometry on device (the reference computes coszen/daylength
    # host-side per step, init_timestep_kokkos.cc:23-31; fusing it into
    # the compiled step removes ~40 eager host ops per window)
    coszen = solar.average_cosz(p.lat_r, p.lon_r, dtime, forcing.decday)
    decl = solar.declination_angle_sin(jnp.floor(forcing.decday))
    dayl = solar.daylength(p.lat_r, decl)
    max_dayl = solar.max_daylength(p.lat_r)

    sol = ap.process_fsds(forcing.fsds, coszen)
    forc_solad, forc_solai = sol.forc_solad, sol.forc_solai
    forc_rain, forc_snow = ap.process_prec(forcing.prec, forc_t)
    forc_u, forc_v = ap.process_wind(forcing.wt1, forcing.wt2,
                                     forcing.wind[0], forcing.wind[1])
    forc_v = jnp.zeros_like(forc_u)
    forc_hgt, forc_hgt_u, forc_hgt_t, forc_hgt_q = ap.process_zbot(
        s.snl.shape[0], forc_t.dtype)
    forc_rho = ap.derive_forc_rho(forc_pbot, forc_q, forc_t)
    forc_po2 = ap.derive_forc_po2(forc_pbot)
    forc_pco2 = ap.derive_forc_pco2(forc_pbot)

    h2osno_old = s.h2osno
    begwb = ce.column_water_mass_tracked(s.h2ocan, s.h2osno, s.h2osfc,
                                         s.h2osoi_ice, s.h2osoi_liq)
    it = ini.init_timestep(land, veg_active, phout.frac_veg_nosno_alb,
                           s.snl, s.h2osno, s.h2osoi_ice, s.h2osoi_liq,
                           jnp.zeros_like(s.snw_rds))
    do_capsnow = it.do_capsnow
    frac_veg_nosno = it.frac_veg_nosno
    frac_iceold5 = it.frac_iceold
    frac_iceold = jnp.concatenate(
        [frac_iceold5, jnp.zeros_like(s.h2osoi_liq[:, c.NLEVSNO:])], axis=1)

    # =================== fraction_wet (canopy_hydrology_kokkos.cc) ========
    fw = chy.fraction_wet(land, frac_veg_nosno, dewmx, elai, esai, s.h2ocan)
    fwet, fdry = fw.fwet, fw.fdry

    # =================== albedo + SNICAR (albedo_kokkos.cc) ===============
    sa_init = sa.init_timestep(land, elai, s.cnc_bcphi, s.cnc_bcpho,
                               s.cnc_dst1, s.cnc_dst2, s.cnc_dst3,
                               s.cnc_dst4)
    soil_alb = sa.soil_albedo(land, s.snl, s.t_grnd, coszen, s.h2osoi_vol,
                              p.albsat, p.albdry)

    # mixed precision: the SNICAR adding-doubling sweep and the two-stream
    # solver are the dominant emulated-f64 cost on TPU (profile r2:
    # [10,8192,5]-shaped fusions + their VMEM traffic); they are
    # diagnostic radiative-transfer math whose ~1e-7 relative f32 error
    # only perturbs the absorbed-flux partition (errsol rises from 1e-13
    # to ~1e-6 W/m2).  Opt-in; default stays reference-exact f64.
    wdt = coszen.dtype

    def _to(x, dt):
        return jax.tree.map(
            lambda a: a.astype(dt) if (hasattr(a, "dtype")
                                       and a.dtype.kind == "f") else a, x)
    if mixed_radiation and wdt == jnp.float64:
        f32 = jnp.float32
        drc, dfs = sn.snicar_ad_rt_both(
            land, *_to((coszen, s.h2osno), f32), s.snl,
            *_to((s.h2osoi_liq, s.h2osoi_ice, s.snw_rds,
                  soil_alb.albsoi, sa_init.mss_cnc_aer_in_fdb, snicar),
                 f32))
        drc, dfs = _to((drc, dfs), wdt)
    else:
        drc, dfs = sn.snicar_ad_rt_both(
            land, coszen, s.h2osno, s.snl, s.h2osoi_liq, s.h2osoi_ice,
            s.snw_rds, soil_alb.albsoi, sa_init.mss_cnc_aer_in_fdb, snicar)
    grd = sa.ground_albedo(land, coszen, s.frac_sno, soil_alb.albsod,
                           soil_alb.albsoi, drc.albout, dfs.albout)
    fab = sa.flux_absorption_factor(land, coszen, s.frac_sno,
                                    soil_alb.albsod, soil_alb.albsoi,
                                    drc.albout, dfs.albout, drc.flx_abs,
                                    dfs.flx_abs)
    can = sa.canopy_layer_lai(land, elai, esai, tlai, tsai)
    if mixed_radiation and wdt == jnp.float64:
        ts = sa.two_stream_solver(
            land, can.nrad, *_to((coszen, s.t_veg, fwet, elai, esai,
                                  can.tlai_z, can.tsai_z, grd.albgrd,
                                  grd.albgri, albveg, sa_init.vcmaxcintsun,
                                  sa_init.vcmaxcintsha), jnp.float32))
        ts = _to(ts, wdt)
    else:
        ts = sa.two_stream_solver(land, can.nrad, coszen, s.t_veg, fwet,
                                  elai, esai, can.tlai_z, can.tsai_z,
                                  grd.albgrd, grd.albgri, albveg,
                                  sa_init.vcmaxcintsun,
                                  sa_init.vcmaxcintsha)

    # =================== canopy_hydrology =================================
    inter = chy.interception(land, frac_veg_nosno, forc_rain, forc_snow,
                             dewmx, elai, esai, dtime, s.h2ocan)
    h2ocan = inter.h2ocan
    gf = chy.ground_flux(land, do_capsnow, frac_veg_nosno, forc_rain,
                         forc_snow, jnp.zeros_like(forc_rain),
                         inter.qflx_candrip, inter.qflx_through_snow,
                         inter.qflx_through_rain, inter.fracsnow,
                         inter.fracrain)
    si = chy.snow_init(land, dtime, do_capsnow, oldfflag, forc_t, s.t_grnd,
                       gf.qflx_snow_grnd, s.qflx_snow_melt, p.n_melt,
                       s.snow_depth, s.h2osno, s.int_snow, s.h2osoi_liq,
                       s.h2osoi_ice, s.t_soisno, frac_iceold, s.snl, s.dz,
                       s.z, s.zi, s.snw_rds, s.frac_sno_eff, s.frac_sno)
    fh = chy.fraction_h2osfc(land, p.micro_sigma, si.h2osno, s.h2osfc,
                             si.h2osoi_liq, si.frac_sno, si.frac_sno_eff)
    snl = si.snl
    h2osoi_liq, h2osoi_ice = fh.h2osoi_liq, si.h2osoi_ice
    t_soisno = si.t_soisno
    dz, z, zi = si.dz, si.z, si.zi
    snw_rds = si.snw_rds
    snow_depth, h2osno, int_snow = si.snow_depth, si.h2osno, si.int_snow
    frac_sno, frac_sno_eff = fh.frac_sno, fh.frac_sno_eff
    frac_h2osfc, h2osfc = fh.frac_h2osfc, fh.h2osfc
    swe_old = si.swe_old
    frac_iceold = si.frac_iceold

    # =================== surface_radiation ================================
    tot = sr.total_absorbed_radiation(
        land, snl, ts.ftdd, ts.ftid, ts.ftii, forc_solad, forc_solai,
        ts.fabd, ts.fabi, soil_alb.albsod, soil_alb.albsoi, drc.albout,
        dfs.albout, grd.albgrd, grd.albgri)
    sabg_lyr = sr.layer_absorbed_radiation(
        land, snl, tot.sabg, tot.sabg_snow, snow_depth, fab.flx_absdv,
        fab.flx_absdn, fab.flx_absiv, fab.flx_absin, tot.trd, tot.tri)
    fsr_out = sr.reflected_radiation(land, ts.albd, ts.albi, forc_solad,
                                     forc_solai)
    sun = sr.canopy_sunshade_fractions(land, can.nrad, elai, can.tlai_z,
                                       ts.fsun_z, forc_solad, forc_solai,
                                       ts.fabd_sun_z, ts.fabd_sha_z,
                                       ts.fabi_sun_z, ts.fabi_sha_z)

    # =================== canopy_temperature ===============================
    old = ct.old_ground_temp(land, s.t_h2osfc, t_soisno)
    tssbef, t_h2osfc_bef = old.tssbef, old.t_h2osfc_bef
    t_grnd = ct.ground_temp(land, snl, frac_sno_eff, frac_h2osfc,
                            s.t_h2osfc, t_soisno)
    salpha = ct.calc_soilalpha(land, frac_sno, frac_h2osfc, h2osoi_liq,
                               h2osoi_ice, dz, t_soisno, p.watsat, p.sucsat,
                               p.bsw)
    soilbeta = ct.calc_soilbeta(land, frac_sno, frac_h2osfc, p.watsat,
                                p.watfc, h2osoi_liq, h2osoi_ice, dz)
    hum = ct.humidities(land, snl, forc_q, forc_pbot, s.t_h2osfc, t_grnd,
                        frac_sno, frac_sno_eff, frac_h2osfc, salpha.qred,
                        salpha.hr, t_soisno)
    gp = ct.ground_properties(
        land, snl, frac_sno, forc_th, forc_q, elai, esai, htop,
        p.displar_v, p.z0mr_v, h2osoi_liq, h2osoi_ice)
    fhgt = ct.forcing_height(land, veg_active, frac_veg_nosno, gp.z0m,
                             gp.z0mg, forc_t, gp.displa, forc_hgt_u,
                             forc_hgt_t, forc_hgt_q)

    return _SurfaceOut(
        forc_t=forc_t, forc_th=forc_th, forc_pbot=forc_pbot, forc_q=forc_q,
        forc_lwrad=forc_lwrad, forc_rain=forc_rain, forc_snow=forc_snow,
        forc_u=forc_u, forc_v=forc_v, forc_rho=forc_rho, forc_po2=forc_po2,
        forc_pco2=forc_pco2, forc_solad=forc_solad, forc_solai=forc_solai,
        dayl=dayl, max_dayl=max_dayl, elai=elai, esai=esai, htop=htop,
        frac_veg_nosno=frac_veg_nosno, do_capsnow=do_capsnow,
        frac_iceold=frac_iceold, swe_old=swe_old, fwet=fwet, fdry=fdry,
        snl=snl, dz=dz, z=z, zi=zi, snw_rds=snw_rds,
        h2osoi_liq=h2osoi_liq, h2osoi_ice=h2osoi_ice, t_soisno=t_soisno,
        snow_depth=snow_depth, h2osno=h2osno, int_snow=int_snow,
        frac_sno=frac_sno, frac_sno_eff=frac_sno_eff,
        frac_h2osfc=frac_h2osfc, h2osfc=h2osfc, h2ocan=h2ocan,
        t_grnd=t_grnd, tssbef=tssbef, t_h2osfc_bef=t_h2osfc_bef,
        soilbeta=soilbeta, begwb=begwb, h2osno_old=h2osno_old,
        hum=hum, gp=gp, fhgt=fhgt, can=can, ts=ts, sun=sun, tot=tot,
        sabg_lyr=sabg_lyr, fsr_out=fsr_out, gf=gf)


def flux_phase(land: c.LandType, psnveg: psn.PFTPsnParams,
               params: ModelParams, state: ModelState, sfo: _SurfaceOut,
               dtime: float, psn_mode: str | None = None,
               warm_start: bool = False,
               mixed_canopy: bool = False) -> _FluxOut:
    """Bareground + canopy Monin-Obukhov flux iterations (the
    photosynthesis-bearing while loops)."""
    s = state
    p = params
    (elai, esai, htop, frac_veg_nosno, fwet, fdry, snl, t_soisno,
     h2osoi_liq, h2osoi_ice, dz, snow_depth, h2ocan, t_grnd,
     frac_sno, frac_h2osfc, soilbeta, hum, gp, fhgt, can, sun,
     tot) = (sfo.elai, sfo.esai, sfo.htop, sfo.frac_veg_nosno, sfo.fwet,
             sfo.fdry, sfo.snl, sfo.t_soisno, sfo.h2osoi_liq,
             sfo.h2osoi_ice, sfo.dz, sfo.snow_depth, sfo.h2ocan,
             sfo.t_grnd, sfo.frac_sno, sfo.frac_h2osfc, sfo.soilbeta,
             sfo.hum, sfo.gp, sfo.fhgt, sfo.can, sfo.sun, sfo.tot)
    ts = sfo.ts
    (forc_t, forc_th, forc_pbot, forc_q, forc_lwrad, forc_u, forc_v,
     forc_rho, forc_po2, forc_pco2, dayl, max_dayl) = (
         sfo.forc_t, sfo.forc_th, sfo.forc_pbot, sfo.forc_q,
         sfo.forc_lwrad, sfo.forc_u, sfo.forc_v, sfo.forc_rho,
         sfo.forc_po2, sfo.forc_pco2, sfo.dayl, sfo.max_dayl)
    thm = fhgt.thm
    vtype = p.vtype
    soybean = (vtype == c.NSOYBEAN) | (vtype == c.NSOYBEANIRRIG)
    veg_active = jnp.ones_like(s.snl, dtype=bool)
    altmax_indx = jnp.full_like(s.snl, 5)
    altmax_lastyear_indx = jnp.zeros_like(s.snl)

    # =================== bareground_fluxes ================================
    zero = jnp.zeros_like(forc_t)
    bg_init = bg.initialize_flux(
        land, frac_veg_nosno, forc_u, forc_v, forc_q, forc_th,
        fhgt.forc_hgt_u_patch, thm, gp.thv, t_grnd, hum.qg, gp.z0mg, zero,
        zero, zero, zero, zero, zero, zero, zero, zero)
    bg_stab = bg.stability_iteration(
        land, frac_veg_nosno, fhgt.forc_hgt_t_patch, fhgt.forc_hgt_u_patch,
        fhgt.forc_hgt_q_patch, gp.z0mg, bg_init.zldis, bg_init.displa,
        bg_init.dth, bg_init.dqh, bg_init.ur, forc_q, forc_th, gp.thv,
        gp.z0hg, gp.z0qg, bg_init.obu, bg_init.um, zero, zero, zero, zero,
        zero)
    bg_cf = bg.compute_flux(
        land, frac_veg_nosno, snl, forc_rho, soilbeta, hum.dqgdT, gp.htvp,
        s.t_h2osfc, hum.qg_snow, hum.qg_soil, hum.qg_h2osfc, t_soisno,
        forc_pbot, bg_init.dth, bg_init.dqh, bg_stab.temp1, bg_stab.temp2,
        bg_stab.temp12m, bg_stab.temp22m, bg_stab.ustar, forc_q, thm, zero,
        zero, zero, zero, zero, zero, zero, zero, zero, zero, zero, zero,
        zero)

    # =================== canopy_fluxes ====================================
    cf_init = cfx.initialize_flux(
        land, psnveg, snl, frac_veg_nosno, frac_sno, fhgt.forc_hgt_u_patch,
        thm, gp.thv, max_dayl, dayl, altmax_indx,
        altmax_lastyear_indx, t_soisno, h2osoi_ice, h2osoi_liq, dz,
        p.rootfr, p.sucsat, p.watsat, p.bsw, elai, esai, gp.emv, gp.emg,
        hum.qg, t_grnd, forc_t, forc_pbot, forc_lwrad, forc_u, forc_v,
        forc_q, forc_th, gp.z0mg, gp.displa, gp.z0mv, s.t_veg)
    obu0, ci_prev = cf_init.obu, None
    if warm_start:
        # previous-step converged Monin-Obukhov length / ci roots seed
        # the stability and photosynthesis solvers (0 = cold column)
        ok = (s.obu_can != 0.0) & jnp.isfinite(s.obu_can)
        obu0 = jnp.where(ok, s.obu_can, cf_init.obu)
        ci_prev = jnp.concatenate([s.ci_sun, s.ci_sha])

    # mixed_canopy (opt-in): run the stability-loop interior — the
    # profile's 1.2 ms/step emulated-f64 hotspot (BASELINE.md roofline
    # r3) — in f32, handing converged fluxes/t_veg back to the f64 step.
    # The loop's own convergence thresholds (0.01 K / 0.1 W/m2) are far
    # above f32 roundoff, and the full-f32 configuration's 15-day drift
    # bounds (tests/test_f32_drift.py) bound this subset's risk; the
    # ledger stays exact because the step debits the same (upcast)
    # fluxes it charges.  Drift-tested in tests/test_mixed_canopy.py.
    wdt2 = t_grnd.dtype

    def _to2(tree, dt):
        return jax.tree.map(
            lambda a: a.astype(dt) if (hasattr(a, "dtype")
                                       and a.dtype.kind == "f") else a,
            tree)
    stab_args = (psnveg, frac_sno,
                 fhgt.forc_hgt_u_patch, fhgt.forc_hgt_t_patch,
                 fhgt.forc_hgt_q_patch, fwet, fdry, sun.laisun, sun.laisha,
                 forc_rho, snow_depth, soilbeta, frac_h2osfc, s.t_h2osfc,
                 tot.sabv, h2ocan, htop, t_soisno, cf_init.air, cf_init.bir,
                 cf_init.cir, cf_init.ur, cf_init.zldis, cf_init.displa,
                 elai, esai, t_grnd, forc_pbot, forc_q, forc_th, gp.z0mg,
                 cf_init.z0mv, cf_init.z0hv, cf_init.z0qv, thm, gp.thv,
                 hum.qg, s.t10, can.tlai_z, ts.vcmaxcintsha,
                 ts.vcmaxcintsun, sun.parsha_z, sun.parsun_z, sun.laisha_z,
                 sun.laisun_z, forc_pco2, forc_po2, cf_init.dayl_factor,
                 cf_init.btran, cf_init.el, cf_init.qsatl, cf_init.qsatldT,
                 cf_init.taf, cf_init.qaf, cf_init.um, obu0, cf_init.delq,
                 cf_init.t_veg, ci_prev)
    if mixed_canopy and wdt2 == jnp.float64:
        stab_args = _to2(stab_args, jnp.float32)
    (pv2, frac_sno2, hgt_u2, hgt_t2, hgt_q2, fwet2, fdry2, laisun2,
     laisha2, rho2, sd2, beta2, fh2o2, th2o2, sabv2, h2ocan2, htop2,
     tsoi2, air2, bir2, cir2, ur2, zldis2, displa2, elai2, esai2, tg2,
     pbot2, q2, th2, z0mg2, z0mv2, z0hv2, z0qv2, thm2, thv2, qg2, t102,
     tlaiz2, vcsha2, vcsun2, parsha2, parsun2, lshaz2, lsunz2, pco22,
     po22, daylf2, btran2, el2, qsatl2, qsatldT2, taf2, qaf2, um2, obu2,
     delq2, tveg02, ci_prev2) = stab_args
    cf_stab = cfx.stability_iteration(
        land, pv2, dtime, snl, frac_veg_nosno, frac_sno2,
        hgt_u2, hgt_t2, hgt_q2, fwet2, fdry2, laisun2, laisha2,
        rho2, sd2, beta2, fh2o2, th2o2, sabv2,
        h2ocan2, htop2, tsoi2, air2, bir2, cir2,
        ur2, zldis2, displa2, elai2, esai2, tg2,
        pbot2, q2, th2, z0mg2, z0mv2, z0hv2,
        z0qv2, thm2, thv2, qg2, can.nrad, t102, tlaiz2,
        vcsha2, vcsun2, parsha2, parsun2,
        lshaz2, lsunz2, pco22, po22,
        daylf2, btran2, el2, qsatl2,
        qsatldT2, taf2, qaf2, um2, obu2,
        delq2, tveg02, psn_mode=psn_mode, soybean=soybean,
        warm_start=warm_start, ci_prev=ci_prev2)
    if mixed_canopy and wdt2 == jnp.float64:
        cf_stab = _to2(cf_stab, wdt2)
    cf_cf = cfx.compute_flux(
        land, dtime, snl, frac_veg_nosno, frac_sno, t_soisno, frac_h2osfc,
        s.t_h2osfc, tot.sabv, hum.qg_snow, hum.qg_soil, hum.qg_h2osfc,
        hum.dqgdT, gp.htvp, cf_stab.wtg, cf_stab.wtl0, cf_stab.wta0,
        cf_stab.wtal, cf_init.air, cf_init.bir, cf_init.cir, cf_stab.qsatl,
        cf_stab.qsatldT, cf_stab.dth, cf_stab.dqh, cf_stab.temp1,
        cf_stab.temp2, cf_stab.temp12m, cf_stab.temp22m, cf_stab.tlbef,
        cf_stab.delq, cf_stab.dt_veg, cf_stab.t_veg, t_grnd, forc_pbot,
        cf_stab.qflx_tran_veg, cf_stab.qflx_evap_veg, cf_stab.eflx_sh_veg,
        forc_q, forc_rho, thm, gp.emv, gp.emg, forc_lwrad, cf_stab.wtgq,
        cf_stab.wtalq, cf_stab.wtlq0, cf_stab.wtaq0, h2ocan,
        bg_cf.eflx_sh_grnd, bg_cf.eflx_sh_snow, bg_cf.eflx_sh_soil,
        bg_cf.eflx_sh_h2osfc, bg_cf.qflx_evap_soi, bg_cf.qflx_ev_snow,
        bg_cf.qflx_ev_soil, bg_cf.qflx_ev_h2osfc, bg_init.dlrad,
        bg_init.ulrad, bg_cf.t_ref2m, bg_cf.q_ref2m, bg_cf.rh_ref2m)
    return _FluxOut(rootr=cf_init.rootr, cf_stab=cf_stab, cf_cf=cf_cf,
                    t_veg=cf_stab.t_veg, h2ocan=cf_cf.h2ocan)


def column_phase(land: c.LandType, params: ModelParams, state: ModelState,
                 forcing: StepForcing, sfo: _SurfaceOut, fl: _FluxOut,
                 dtime: float, elm_correct_snow_aging: bool = False,
                 elm_correct_seb: bool = False
                 ) -> tuple[ModelState, StepDiagnostics]:
    """Soil/snow temperature solve + phase change, snow hydrology,
    surface flux finalization, conservation diagnostics, state assembly."""
    s = state
    p = params
    (snl, dz, z, zi, snw_rds, h2osoi_liq, h2osoi_ice, t_soisno,
     snow_depth, h2osno, int_snow, frac_sno, frac_sno_eff, frac_h2osfc,
     h2osfc, t_grnd, tssbef, t_h2osfc_bef, begwb,
     h2osno_old) = (sfo.snl, sfo.dz, sfo.z, sfo.zi, sfo.snw_rds,
                    sfo.h2osoi_liq, sfo.h2osoi_ice, sfo.t_soisno,
                    sfo.snow_depth, sfo.h2osno, sfo.int_snow, sfo.frac_sno,
                    sfo.frac_sno_eff, sfo.frac_h2osfc, sfo.h2osfc,
                    sfo.t_grnd, sfo.tssbef, sfo.t_h2osfc_bef, sfo.begwb,
                    sfo.h2osno_old)
    (forc_t, forc_lwrad, forc_rain, forc_snow, forc_solad,
     forc_solai) = (sfo.forc_t, sfo.forc_lwrad, sfo.forc_rain,
                    sfo.forc_snow, sfo.forc_solad, sfo.forc_solai)
    (frac_veg_nosno, do_capsnow, frac_iceold, swe_old, gp, tot, sabg_lyr,
     fsr_out, gf) = (sfo.frac_veg_nosno, sfo.do_capsnow, sfo.frac_iceold,
                     sfo.swe_old, sfo.gp, sfo.tot, sfo.sabg_lyr,
                     sfo.fsr_out, sfo.gf)
    cf_stab, cf_cf = fl.cf_stab, fl.cf_cf
    h2ocan, t_veg = fl.h2ocan, fl.t_veg
    cf_init_rootr = fl.rootr
    veg_active = jnp.ones_like(s.snl, dtype=bool)

    # =================== soil_temperature (7-stage chain) =================
    props = sth.thermal_properties(land, snl, frac_sno, frac_h2osfc,
                                   h2osno, h2osfc, h2osoi_liq, h2osoi_ice,
                                   t_soisno, dz, z, zi, p.watsat, p.tkmg,
                                   p.tkdry, p.csol)
    snotop = (c.NLEVSNO - snl)[:, None]
    sabg_lyr_top = take_layer(sabg_lyr, snotop[:, 0])
    t_top_sno = take_layer(t_soisno, snotop[:, 0])
    sabg_chk = stp.check_absorbed_solar(frac_sno_eff, tot.sabg_snow,
                                        tot.sabg_soil)
    hs_soil = stp.calc_surface_heat_flux(
        frac_veg_nosno, cf_cf.dlrad, gp.emg, forc_lwrad, gp.htvp,
        tot.sabg_soil, t_soisno[:, c.NLEVSNO], cf_cf.eflx_sh_soil,
        cf_cf.qflx_ev_soil)
    hs_h2osfc = stp.calc_surface_heat_flux(
        frac_veg_nosno, cf_cf.dlrad, gp.emg, forc_lwrad, gp.htvp,
        tot.sabg_soil, s.t_h2osfc, cf_cf.eflx_sh_h2osfc,
        cf_cf.qflx_ev_h2osfc)
    hs_top_snow = stp.calc_surface_heat_flux(
        frac_veg_nosno, cf_cf.dlrad, gp.emg, forc_lwrad, gp.htvp,
        sabg_lyr_top, t_top_sno, cf_cf.eflx_sh_snow, cf_cf.qflx_ev_snow)
    dhsdT = stp.calc_dhsdT(cf_cf.cgrnd, gp.emg, t_grnd)

    fn = stp.calc_diffusive_heat_flux(snl, props.tk, t_soisno, z)
    fact = stp.calc_heat_flux_matrix_factor(snl, dtime, props.cv, dz, z, zi)
    lhs, rhs = stp._assemble_system(
        snl, dtime, dhsdT, frac_sno_eff, frac_h2osfc, props.dz_h2osfc,
        props.c_h2osfc, props.tk_h2osfc, z, fact, props.tk, hs_top_snow,
        hs_soil, hs_h2osfc, t_soisno, s.t_h2osfc, fn, sabg_lyr)
    tvec = stp.pdma_solve(lhs, rhs)
    upd = stp.update_temperature(snl, frac_h2osfc, tvec, t_soisno)

    pc1 = stp.phase_change_h2osfc(
        snl, dtime, frac_sno, frac_h2osfc, dhsdT, props.c_h2osfc,
        fact[:, c.NLEVSNO - 1], upd.t_h2osfc, h2osfc, h2osno, int_snow,
        snow_depth, h2osoi_ice[:, c.NLEVSNO - 1],
        upd.t_soisno[:, c.NLEVSNO - 1])
    ice_a = h2osoi_ice.at[:, c.NLEVSNO - 1].set(pc1.h2osoi_ice_sl1)
    t_a = upd.t_soisno.at[:, c.NLEVSNO - 1].set(pc1.t_soisno_sl1)
    pc2 = stp.phase_change_soisno(
        land, snl, dtime, dhsdT, frac_h2osfc, frac_sno_eff, fact, p.watsat,
        p.sucsat, p.bsw, dz, pc1.h2osno, pc1.snow_depth, ice_a, h2osoi_liq,
        t_a)
    t_soisno = pc2.t_soisno
    h2osoi_ice, h2osoi_liq = pc2.h2osoi_ice, pc2.h2osoi_liq
    h2osno, snow_depth = pc2.h2osno, pc2.snow_depth
    h2osfc, int_snow = pc1.h2osfc, pc1.int_snow
    t_h2osfc = pc1.t_h2osfc
    t_grnd = stp.update_t_grnd(snl, frac_h2osfc, frac_sno_eff, t_h2osfc,
                               t_soisno)
    qflx_snow_melt = pc2.qflx_snow_melt
    qflx_snomelt = pc2.qflx_snomelt

    # =================== snow_hydrology ===================================
    snl_sw, fse_sw = snl, frac_sno_eff  # inputs snow_water acts with
    sw = sh.snow_water(land, do_capsnow, snl, dtime, frac_sno_eff, h2osno,
                       s.qflx_sub_snow, s.qflx_evap_grnd, s.qflx_dew_snow,
                       s.qflx_dew_grnd, gf.qflx_rain_grnd, qflx_snomelt,
                       qflx_snow_melt, int_snow, frac_sno, h2osoi_liq,
                       h2osoi_ice, s.mss, dz)
    # deposition rates: monthly-interpolated (StepForcing.aero) when a
    # deposition climatology is wired, else static params — the reference
    # disables its monthly manager entirely (aerosol_data_old.h)
    if forcing.aero is None:
        aero_in = p.aero_in
    else:
        from elmkernels_tpu.data.state import AERO_DEP_KEYS
        aero_in = {k: forcing.aero[i] for i, k in enumerate(AERO_DEP_KEYS)}
    mss = sh.compute_aerosol_deposition(dtime, snl, aero_in, sw.mss)
    bcphi, bcpho = sh.aerosol_phase_change(snl, dtime, s.qflx_sub_snow,
                                           sw.h2osoi_liq, sw.h2osoi_ice,
                                           mss["bcphi"], mss["bcpho"])
    mss = dict(mss, bcphi=bcphi, bcpho=bcpho)
    qflx_rootsoi = sh.transpiration(veg_active, cf_stab.qflx_tran_veg,
                                    cf_init_rootr)
    dz = sh.snow_compaction(land, snl, dtime, sw.int_snow, p.n_melt,
                            sw.frac_sno, pc2.imelt, swe_old,
                            sw.h2osoi_liq, sw.h2osoi_ice, t_soisno,
                            frac_iceold, sw.dz)
    st = sh.SnowState(snl, t_soisno, sw.h2osoi_ice, sw.h2osoi_liq, snw_rds,
                      mss, dz, z, zi)
    cb = sh.combine_layers(land, dtime, st, h2osno, snow_depth,
                           frac_sno_eff, sw.frac_sno, sw.int_snow)
    # ELM proper runs CombineSnowLayers only over the snowc filter —
    # columns WITH snow layers (SnowHydrologyMod.F90); the extracted
    # kernel lost that filter, so for snl == 0 its pack totals
    # (reference snow_hydrology_impl.hh:758-815) see zero active layers
    # and silently wipe a layerless pack (h2osno > 0) with no
    # compensating flux. The kernel stays reference-exact (golden
    # parity); the driver restores the filter: layerless columns pass
    # their pack scalars through untouched.
    nolyr = snl == 0
    cb = cb._replace(
        h2osno=jnp.where(nolyr, h2osno, cb.h2osno),
        snow_depth=jnp.where(nolyr, snow_depth, cb.snow_depth),
        frac_sno=jnp.where(nolyr, sw.frac_sno, cb.frac_sno),
        frac_sno_eff=jnp.where(nolyr, frac_sno_eff, cb.frac_sno_eff),
        int_snow=jnp.where(nolyr, sw.int_snow, cb.int_snow),
        qflx_sl_top_soil=jnp.where(nolyr, 0.0, cb.qflx_sl_top_soil),
        qflx_snow2topsoi=jnp.where(nolyr, 0.0, cb.qflx_snow2topsoi),
        mflx_snowlyr_col=jnp.where(nolyr, 0.0, cb.mflx_snowlyr_col))
    st = sh.divide_layers(cb.frac_sno, cb.state)
    st = sh.prune_snow_layers(st)
    mss2, cnc = sh.update_aerosol_mass_and_concen(
        dtime, st.snl, do_capsnow, gf.qflx_snwcp_ice, st.ice, st.liq,
        st.mss)
    if elm_correct_snow_aging:
        snw_rds = sh.snow_aging(do_capsnow, st.snl, cb.frac_sno, dtime,
                                gf.qflx_snwcp_ice, gf.qflx_snow_grnd,
                                cb.h2osno, st.dz, st.liq, st.ice, st.t,
                                pc2.qflx_snofrz_lyr, p.snowage_tau,
                                p.snowage_kappa, p.snowage_drdt0, st.rds,
                                elm_correct_clamp=True)
    else:
        # snow_aging's table pipeline is dead under the reference's
        # double-clamp quirk; the pinned path is bit-identical (see
        # snow_aging_pinned) and drops the per-step table gathers
        snw_rds = sh.snow_aging_pinned(st.snl, cb.h2osno, st.rds)
    snl, t_soisno = st.snl, st.t
    h2osoi_ice, h2osoi_liq = st.ice, st.liq
    dz, z, zi = st.dz, st.z, st.zi
    h2osno, snow_depth = cb.h2osno, cb.snow_depth
    frac_sno, frac_sno_eff = cb.frac_sno, cb.frac_sno_eff
    int_snow = cb.int_snow
    qflx_snow_melt = sw.qflx_snow_melt

    # =================== surface_fluxes ===================================
    snotop2 = (c.NLEVSNO - snl)[:, None]
    tssbef_snotop = take_layer(tssbef, snotop2[:, 0])
    tssbef_soitop = tssbef[:, c.NLEVSNO]
    sfi = sf.initial_flux_calc(
        land, snl, frac_sno_eff, frac_h2osfc, t_h2osfc_bef, tssbef_snotop,
        tssbef_soitop, t_grnd, cf_cf.cgrnds, cf_cf.cgrndl,
        cf_cf.eflx_sh_grnd, cf_cf.qflx_evap_soi, cf_cf.qflx_ev_snow,
        cf_cf.qflx_ev_soil, cf_cf.qflx_ev_h2osfc)
    ice_snotop = take_layer(h2osoi_ice, snotop2[:, 0])
    liq_soitop = h2osoi_liq[:, c.NLEVSNO]  # reference reads soil-top liq
    sfu = sf.update_surface_fluxes(
        land, do_capsnow, snl, dtime, t_grnd, gp.htvp, frac_sno_eff,
        frac_h2osfc, t_h2osfc_bef, tot.sabg_soil, tot.sabg_snow,
        cf_cf.dlrad, frac_veg_nosno.astype(forc_t.dtype), gp.emg,
        forc_lwrad, tssbef_snotop, tssbef_soitop, ice_snotop, liq_soitop,
        cf_stab.eflx_sh_veg, cf_stab.qflx_evap_veg, sfi.qflx_evap_soi,
        sfi.eflx_sh_grnd, sfi.qflx_ev_snow, sfi.qflx_ev_soil,
        sfi.qflx_ev_h2osfc, gf.qflx_snwcp_liq, gf.qflx_snwcp_ice,
        elm_correct_seb=elm_correct_seb)
    lw = sf.lwrad_outgoing(
        land, snl, frac_veg_nosno, forc_lwrad, frac_sno_eff, tssbef_snotop,
        tssbef_soitop, frac_h2osfc, t_h2osfc_bef, t_grnd, cf_cf.ulrad,
        gp.emg)
    errsoi = sf.soil_energy_balance(
        land, snl, sfu.eflx_soil_grnd, pc2.xmf, pc1.xmf_h2osfc,
        frac_h2osfc, t_h2osfc, t_h2osfc_bef, dtime,
        pc1.eflx_h2osfc_to_snow, frac_sno_eff, t_soisno, tssbef, fact)

    # =================== conservation =====================================
    endwb = ce.column_water_mass_tracked(h2ocan, h2osno, h2osfc,
                                         h2osoi_ice, h2osoi_liq)
    errh2o = ce.column_water_balance_error(
        begwb, endwb, jnp.zeros_like(begwb), forc_rain, forc_snow,
        sfu.qflx_evap_tot, sfu.qflx_snwcp_ice, dtime)
    errh2osno = ce.snow_water_balance_error(
        snl, sfu.qflx_dew_snow, sfu.qflx_dew_grnd, sfu.qflx_sub_snow,
        sfu.qflx_evap_grnd, qflx_snow_melt, sfu.qflx_snwcp_ice,
        sfu.qflx_snwcp_liq, cb.qflx_sl_top_soil, frac_sno_eff,
        gf.qflx_rain_grnd, gf.qflx_snow_grnd, pc1.qflx_h2osfc_to_ice,
        h2osno, h2osno_old, dtime, do_capsnow)
    # correctly-TIMED snow balance: errh2osno above reproduces the
    # reference's printed view, which charges the CURRENT step's
    # evaporative fluxes and the POST-combine snow fraction — but the
    # pack was actually debited by snow_water with the PREVIOUS step's
    # partition (s.qflx_*) weighted by the PRE-hydrology fse_sw
    # (reference one-step-lag design, snow_hydrology_kokkos.cc
    # ordering), and capped-precip diversion used ground_flux's snwcp,
    # not surface_fluxes' evap-corrected recompute.  Re-charging the
    # applied terms makes the snow store's balance an invariant a guard
    # can watch on steady steps; layer-count transitions (pack
    # creation/branch switches) remain accounting events, masked by the
    # guard via the _steady reduction (tests/test_snow_balance_guard.py)
    errh2osno_app = ce.snow_water_balance_error(
        snl, s.qflx_dew_snow, s.qflx_dew_grnd, s.qflx_sub_snow,
        s.qflx_evap_grnd, qflx_snow_melt, gf.qflx_snwcp_ice,
        gf.qflx_snwcp_liq, cb.qflx_sl_top_soil, fse_sw,
        gf.qflx_rain_grnd, gf.qflx_snow_grnd, pc1.qflx_h2osfc_to_ice,
        h2osno, h2osno_old, dtime, do_capsnow)
    # the negative-liquid correction walk moves pack mass to the top
    # soil row mid-step (snow_water; restored in r4) — a real pack
    # export the reference's formula predates (first tripped by a
    # melting tropical pack at day 8 of the r5 year run: 1.58 mm/step
    # = exactly mflx_neg_snow*dt).  The ledger charges it; so must the
    # snow balance: negative mflx_neg_snow is mass the walk retained in
    # the pack against the percolation estimate, i.e. an extra source
    # term.  (Layer-removal mass, mflx_snowlyr_col, always coincides
    # with an snl change and is covered by the mask below.)
    errh2osno_app = errh2osno_app + jnp.where(
        snl > 0, sw.mflx_neg_snow * dtime, 0.0)
    # mask layer-count transitions: combine/divide/creation move mass
    # between the layered pack and the layerless store mid-step, which
    # the flux charge can't see; steady steps must balance
    errh2osno_steady = jnp.where(snl == s.snl, errh2osno_app, 0.0)
    # closed water ledger: errh2o charges the CURRENT step's evap_tot +
    # snwcp_ice against the stores, but the stores were actually debited
    # with (a) the PREVIOUS step's ground-evaporation partition, weighted
    # by the snow fraction snow_water used (reference one-step-lag design,
    # snow_hydrology_kokkos.cc ordering), (b) the canopy (evap - tran),
    # and the explicit exports to the external hydrology model
    # (qflx_top_soil, snow-cap runoff).  Re-charging the applied terms
    # instead closes the balance to the mm-1e-6 level and makes any real
    # leak visible (VERDICT r1 item 9).
    capb = do_capsnow != 0
    ice_appl = jnp.where(capb, fse_sw * s.qflx_sub_snow,
                         fse_sw * (s.qflx_sub_snow - s.qflx_dew_snow))
    # rain reaching the ground (incl. canopy drip) enters the ledger's
    # re-charge ONLY for a layerless pack, where snow_water both stores
    # fse*rain in the top soil row AND exports the full rain via
    # qflx_top_soil (the double-count dbl_rain corrects below).  A
    # LAYERED pack absorbs fse*rain into its top layer consistently
    # with errh2o's rain charge, so re-charging it there fabricated a
    # -fse*rain ledger error — reachable only via liquid canopy drip
    # onto a frozen pack (caught at day 29 of the r4 262k-column
    # winter integration, 3.9e-3 mm = exactly fse*rain_grnd*dt)
    rain_led = jnp.where(snl_sw == 0, gf.qflx_rain_grnd, 0.0)
    liq_appl = jnp.where(capb, fse_sw * s.qflx_evap_grnd,
                         fse_sw * (s.qflx_evap_grnd - s.qflx_dew_grnd
                                   - rain_led))
    canopy_appl = cf_stab.qflx_evap_veg - cf_stab.qflx_tran_veg
    # Rain balance audit (r5, single-column decomposition of the year
    # run's day-29 trip — led = exactly -fse*rain*dt on 55 layerless
    # melting tropical packs): for a layerless pack snow_water stores
    # fse*rain in the top soil row and exports the FULL rain via
    # qflx_top_soil, so out must total rain - fse*rain.  qflx_top_soil
    # contributes +rain and rain_led in liq_appl the -fse*rain; the r4
    # `dbl_rain` term subtracted fse*rain a SECOND time, replacing the
    # +fse*rain error it meant to fix with an equal -fse*rain one
    # (unreachable in r4's runs, which saw no mm-scale rain on
    # layerless packs after the fix landed).  Pinned by
    # tests/test_driver.py::test_rain_on_layerless_pack_ledger.
    out_applied = (ice_appl + liq_appl + canopy_appl + sw.qflx_top_soil
                   + sfu.qflx_snwcp_liq + sfu.qflx_snwcp_ice
                   + sw.mflx_neg_snow)
    errh2o_led = errh2o - (sfu.qflx_evap_tot + sfu.qflx_snwcp_ice
                           - out_applied) * dtime

    errsol = ce.solar_shortwave_balance_error(tot.fsa, fsr_out, forc_solad,
                                              forc_solai)
    errlon = ce.solar_longwave_balance_error(lw.eflx_lwrad_out,
                                             lw.eflx_lwrad_net, forc_lwrad)
    errseb = ce.surface_energy_balance_error(
        tot.sabv, sabg_chk, forc_lwrad, lw.eflx_lwrad_out, sfu.eflx_sh_tot,
        sfu.eflx_lh_tot, sfu.eflx_soil_grnd)
    netrad = ce.net_radiation(tot.fsa, lw.eflx_lwrad_net)

    new_state = s._replace(
        snl=snl, snow_depth=snow_depth, frac_sno=frac_sno,
        frac_sno_eff=frac_sno_eff, int_snow=int_snow, h2osno=h2osno,
        snw_rds=snw_rds, h2ocan=h2ocan, h2osfc=h2osfc,
        frac_h2osfc=frac_h2osfc, h2osoi_liq=h2osoi_liq,
        h2osoi_ice=h2osoi_ice, t_soisno=t_soisno, t_grnd=t_grnd,
        t_h2osfc=t_h2osfc, t_veg=t_veg, dz=dz, z=z, zi=zi,
        qflx_snow_melt=qflx_snow_melt, qflx_sub_snow=sfu.qflx_sub_snow,
        qflx_evap_grnd=sfu.qflx_evap_grnd, qflx_dew_snow=sfu.qflx_dew_snow,
        qflx_dew_grnd=sfu.qflx_dew_grnd,
        ci_sun=cf_stab.ci[:s.snl.shape[0]],
        ci_sha=cf_stab.ci[s.snl.shape[0]:],
        obu_can=cf_stab.obu,
        **{"mss_" + k: v for k, v in mss2.items()},
        **{"cnc_" + k: v for k, v in cnc.items()})

    diags = StepDiagnostics(
        eflx_sh_tot=sfu.eflx_sh_tot, eflx_lh_tot=sfu.eflx_lh_tot,
        eflx_soil_grnd=sfu.eflx_soil_grnd,
        eflx_lwrad_out=lw.eflx_lwrad_out, eflx_lwrad_net=lw.eflx_lwrad_net,
        qflx_evap_tot=sfu.qflx_evap_tot,
        qflx_tran_veg=cf_stab.qflx_tran_veg,
        qflx_top_soil=sw.qflx_top_soil, qflx_rootsoi=qflx_rootsoi,
        qflx_sl_top_soil=cb.qflx_sl_top_soil,
        qflx_snow2topsoi=cb.qflx_snow2topsoi,
        qflx_snwcp_liq=sfu.qflx_snwcp_liq,
        qflx_snwcp_ice=sfu.qflx_snwcp_ice,
        mflx_snowlyr=cb.mflx_snowlyr_col, mflx_neg_snow=sw.mflx_neg_snow,
        fsa=tot.fsa, fsr=fsr_out, t_ref2m=cf_cf.t_ref2m, errh2o=errh2o,
        errh2o_led=errh2o_led,
        errh2osno=errh2osno, errh2osno_steady=errh2osno_steady,
        errsol=errsol, errlon=errlon, errseb=errseb,
        errsoi=errsoi, netrad=netrad, niters_canopy=cf_stab.itlef,
        niters_ci=(cf_stab.psn_iters[:s.snl.shape[0]]
                   + cf_stab.psn_iters[s.snl.shape[0]:]))
    return new_state, diags
