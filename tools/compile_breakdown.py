#!/usr/bin/env python3
"""Per-group XLA compile-time breakdown of the full coupled step.

VERDICT r1 flagged a 27-min f64 cold compile; this tool attributes
lowering+compile wall time to each physics group so unroll-to-scan
conversions target the actual dominators instead of guesses.

Each group is jitted standalone with abstract [ncol,...] inputs and
timed through ``jit(fn).lower(...).compile()`` — no execution, no
golden data.  Numbers do not sum exactly to the fused-step compile
(XLA's fusion/layout passes are superlinear in graph size) but the
ranking transfers.

Usage: CB_NCOL=8192 CB_F32=0 python tools/compile_breakdown.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# fresh cache dir so times are true cold compiles
jax.config.update("jax_compilation_cache_dir", None)


def main():
    if os.environ.get("CB_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CB_PLATFORM"])
    f32 = os.environ.get("CB_F32", "0") == "1"
    if not f32:
        jax.config.update("jax_enable_x64", True)
    ncol = int(os.environ.get("CB_NCOL", "8192"))

    import jax.numpy as jnp
    from elmkernels_tpu.driver import step as step_mod
    from elmkernels_tpu.utils.dates import Date

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from elmkernels_tpu.driver.model import Model
        model = Model(ncol=ncol)
        date = Date.from_ymd(1985, 7, 1, 6 * 3600)
        forc = jax.tree.map(jnp.asarray,
                            model.forcing.window(date, model.dtime))
        phen = jax.tree.map(jnp.asarray, model.phenology.window(date))
    land, psnveg, albveg, dtime = (model.land, model.psnveg, model.albveg,
                                   model.dtime)
    snicar, params, state = model.snicar, model.params, model.state

    rows = []

    count_only = os.environ.get("CB_MODE") == "count"

    def bench(name, fn, *args):
        try:
            t0 = time.time()
            lowered = jax.jit(fn).lower(*args)
            t_lower = time.time() - t0
            if count_only:  # HLO size attribution, no compile (fast, CPU)
                n = lowered.as_text().count("\n")
                rows.append((name, t_lower, n))
                print(f"{name:28s} {n:8d} stablehlo lines", flush=True)
                return
            t0 = time.time()
            lowered.compile()
            t_comp = time.time() - t0
        except Exception as e:  # probes hand-build args; don't lose the run
            print(f"{name:28s} FAILED: {e}", file=sys.stderr, flush=True)
            return
        rows.append((name, t_lower, t_comp))
        print(f"{name:28s} lower {t_lower:7.1f}s  compile {t_comp:7.1f}s",
              flush=True)

    # ---- the full fused step (the real number) --------------------------
    if os.environ.get("CB_FULL", "1") == "1":
        bench("FULL advance", lambda sn, p, st, f, ph: step_mod.advance(
            land, psnveg, albveg, sn, p, st, f, ph, dtime),
            snicar, params, state, forc, phen)

    # ---- phase-split compiles (VERDICT r2 item 2): the same step as
    # three standalone executables.  XLA's optimization passes are
    # superlinear in graph size, so sum(phases) << FULL measures what a
    # segmented dispatch loop would pay in compile time.
    if os.environ.get("CB_PHASES", "1") == "1":
        def fn_surface(sn, p, st, f, ph):
            return step_mod.surface_phase(land, albveg, sn, p, st, f, ph,
                                          dtime)

        def fn_flux(pv, p, st, sfo):
            return step_mod.flux_phase(land, pv, p, st, sfo, dtime,
                                       psn_mode=model.psn_mode)

        def fn_column(p, st, f, sfo, fl):
            return step_mod.column_phase(land, p, st, f, sfo, fl, dtime)

        sfo_abs = jax.eval_shape(fn_surface, snicar, params, state, forc,
                                 phen)
        fl_abs = jax.eval_shape(fn_flux, psnveg, params, state, sfo_abs)
        bench("phase: surface", fn_surface, snicar, params, state, forc,
              phen)
        bench("phase: fluxes", fn_flux, psnveg, params, state, sfo_abs)
        bench("phase: column", fn_column, params, state, forc, sfo_abs,
              fl_abs)

    # ---- per-group probes ------------------------------------------------
    from elmkernels_tpu import constants as c
    from elmkernels_tpu.physics import (canopy_fluxes as cfx, photosynthesis
                                        as psn, snow_hydrology as sh,
                                        snow_snicar as sn_mod,
                                        soil_temperature as stp,
                                        surface_albedo as sa)

    s = state
    p = params
    coszen = jnp.full((ncol,), 0.4, s.t_grnd.dtype)

    def probe_snicar(st):
        soil_alb = sa.soil_albedo(land, st.snl, st.t_grnd, coszen,
                                  st.h2osoi_vol, p.albsat, p.albdry)
        sa_init = sa.init_timestep(land, jnp.ones_like(coszen),
                                   st.cnc_bcphi, st.cnc_bcpho, st.cnc_dst1,
                                   st.cnc_dst2, st.cnc_dst3, st.cnc_dst4)
        return sn_mod.snicar_ad_rt_both(
            land, coszen, st.h2osno, st.snl, st.h2osoi_liq, st.h2osoi_ice,
            st.snw_rds, soil_alb.albsoi, sa_init.mss_cnc_aer_in_fdb, snicar)
    bench("snicar_ad_rt_both", probe_snicar, state)

    def probe_twostream(st):
        elai = jnp.ones_like(coszen)
        esai = 0.1 * elai
        can = sa.canopy_layer_lai(land, elai, esai, elai, esai)
        albg = jnp.full((ncol, 2), 0.2, coszen.dtype)
        return sa.two_stream_solver(land, can.nrad, coszen, st.t_veg,
                                    0.1 * elai, elai, esai, can.tlai_z,
                                    can.tsai_z, albg, albg, albveg,
                                    jnp.ones_like(coszen),
                                    jnp.ones_like(coszen))
    bench("two_stream_solver", probe_twostream, state)

    def probe_soiltemp(st):
        from elmkernels_tpu.physics import soil_thermal as sth
        dt64 = jnp.asarray(dtime, st.t_grnd.dtype)
        props = sth.thermal_properties(
            land, st.snl, st.frac_sno, st.frac_h2osfc, st.h2osno, st.h2osfc,
            st.h2osoi_liq, st.h2osoi_ice, st.t_soisno, st.dz, st.z, st.zi,
            p.watsat, p.tkmg, p.tkdry, p.csol)
        hs = jnp.zeros_like(coszen)
        dhsdT = jnp.full_like(coszen, -1.0)
        fn_ = stp.calc_diffusive_heat_flux(st.snl, props.tk, st.t_soisno,
                                           st.z)
        fact = stp.calc_heat_flux_matrix_factor(st.snl, dtime, props.cv,
                                                st.dz, st.z, st.zi)
        sabg_lyr = jnp.zeros((ncol, c.NLEVSNO + 1), coszen.dtype)
        lhs, rhs = stp._assemble_system(
            st.snl, dtime, dhsdT, st.frac_sno_eff, st.frac_h2osfc,
            props.dz_h2osfc, props.c_h2osfc, props.tk_h2osfc, st.z, fact,
            props.tk, hs, hs, hs, st.t_soisno, st.t_h2osfc, fn_, sabg_lyr)
        tvec = stp.pdma_solve(lhs, rhs)
        upd = stp.update_temperature(st.snl, st.frac_h2osfc, tvec,
                                     st.t_soisno)
        pc2 = stp.phase_change_soisno(
            land, st.snl, dtime, dhsdT, st.frac_h2osfc, st.frac_sno_eff,
            fact, p.watsat, p.sucsat, p.bsw, st.dz, st.h2osno,
            st.snow_depth, st.h2osoi_ice, st.h2osoi_liq, upd.t_soisno)
        return pc2
    bench("soil_temperature chain", probe_soiltemp, state)

    def probe_snowhyd(st):
        zero = jnp.zeros_like(coszen)
        dtd = dtime
        sw = sh.snow_water(land, jnp.zeros_like(st.snl, bool), st.snl, dtd,
                           st.frac_sno_eff, st.h2osno, zero, zero, zero,
                           zero, zero, zero, zero, st.int_snow, st.frac_sno,
                           st.h2osoi_liq, st.h2osoi_ice, st.mss,
                           st.dz)
        dz = sh.snow_compaction(land, st.snl, dtd, sw.int_snow, p.n_melt,
                                sw.frac_sno,
                                jnp.zeros_like(st.h2osoi_liq[:, :5],
                                               dtype=jnp.int32),
                                st.h2osoi_liq[:, :5] * 0,
                                sw.h2osoi_liq, sw.h2osoi_ice, st.t_soisno,
                                jnp.zeros_like(st.h2osoi_liq), sw.dz)
        stt = sh.SnowState(st.snl, st.t_soisno, sw.h2osoi_ice,
                           sw.h2osoi_liq, st.snw_rds, sw.mss, dz, st.z,
                           st.zi)
        cb = sh.combine_layers(land, dtd, stt, st.h2osno, st.snow_depth,
                               st.frac_sno_eff, sw.frac_sno, sw.int_snow)
        stt = sh.divide_layers(cb.frac_sno, cb.state)
        return sh.prune_snow_layers(stt)
    bench("snow_hydrology chain", probe_snowhyd, state)

    def probe_canopy(st):
        # canopy stability iteration incl. photosynthesis hybrid solver
        ones = jnp.ones_like(coszen)
        zero = jnp.zeros_like(coszen)
        elai = ones
        esai = 0.1 * ones
        can = sa.canopy_layer_lai(land, elai, esai, elai, esai)
        soybean = jnp.zeros_like(st.snl, bool)
        return cfx.stability_iteration(
            land, psnveg, dtime, st.snl, jnp.ones_like(st.snl), st.frac_sno,
            30.0 * ones, 285.0 * ones, 285.5 * ones, 0.1 * ones, 0.9 * ones,
            ones, ones, 1.2 * ones, st.snow_depth, ones, st.frac_h2osfc,
            st.t_h2osfc, 100.0 * ones, st.h2ocan, ones, st.t_soisno,
            -300.0 * ones, -1.0 * ones, -1.0 * ones, 3.0 * ones,
            28.0 * ones, 0.67 * ones, elai, esai, st.t_grnd,
            101325.0 * ones, 0.008 * ones, 285.0 * ones, 0.01 * ones,
            0.05 * ones, 0.01 * ones, 0.01 * ones, 284.0 * ones,
            286.0 * ones, 0.009 * ones, can.nrad, 283.0 * ones, can.tlai_z,
            ones, ones, 100.0 * ones[:, None], 100.0 * ones[:, None],
            0.5 * ones[:, None], 0.5 * ones[:, None], 20.0 * ones,
            21000.0 * ones, ones, 0.5 * ones, 2000.0 * ones, 0.008 * ones,
            zero, 284.0 * ones, 0.008 * ones, 2.0 * ones, -1.0 * ones,
            zero, 283.0 * ones, psn_mode=model.psn_mode, soybean=soybean)
    bench("canopy stability+psn", probe_canopy, state)

    print("\n=== ranking (compile) ===")
    for name, tl, tc in sorted(rows, key=lambda r: -r[2]):
        print(f"{tc:8.1f}s  {name}")


if __name__ == "__main__":
    main()
