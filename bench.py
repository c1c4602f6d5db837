#!/usr/bin/env python3
"""Benchmark: full coupled water+energy step throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md): this run
*establishes* the baseline, so vs_baseline is reported as 1.0.

Config (BASELINE.json config 4): batched columns, full physics step,
multi-step steady-state timing.  Sync discipline: on remote-tunnel
backends ``block_until_ready`` can resolve at enqueue, so every timing
window ends with a scalar device->host pull whose fixed cost is
measured separately (median of repeated pulls on ready state) and
subtracted.  Estimator (r5): each scan window is timed individually
and the headline is the best-of-two FULL DIURNAL DAYS — 48 consecutive
1800 s steps per day — so day/night solver-iteration variance between
windows is *covered exactly once per day* instead of landing in a
short/long-window differential (the r4 estimator's failure mode:
different windows have genuinely different iteration counts, so the
differential inherited single-window variance).

Environment knobs:
  BENCH_NCOL   columns (default 8192)
  BENCH_STEPS  steps per scan window (default 12; 4 windows = 1 day)
  BENCH_DAYS   full diurnal days to time (default 2; best-of is used)
  BENCH_F32    set to 1 to run single precision (default f64)
  BENCH_SCAN   1 (default): run steps inside one lax.scan executable
               (the production time loop); 0: per-step dispatch
  BENCH_MIXED  1 (default): the full production default — f64
               prognostics + f32 radiative solvers + f32 canopy-loop
               interior + warm-started solvers (all drift-tested,
               promoted r3/r4); 0: the reference-exact opt-out (pure
               f64, cold-start iteration sequences)
  BENCH_WARM   override warm_start alone (default follows BENCH_MIXED)
  BENCH_MIXED_CANOPY  override mixed_canopy alone (default follows
               BENCH_MIXED)
  BENCH_PACKED 1: dtype-fused scan-carry buffers (Model.packed_carry;
               r5 roofline lever, opt-in)
  BENCH_HETERO 1: heterogeneous global-style grid — per-column lat
               (55S..70N), lon, soil color/texture, and a 4-PFT mix
               (compiles the mixed C3/C4 pathway); default 0 =
               homogeneous reference site
  BENCH_COMPILE_EFFORT  optional XLA exec_time_optimization_effort
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/elmtpu_jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    if os.environ.get("BENCH_PLATFORM"):  # dev override (site config
        jax.config.update("jax_platforms",  # ignores JAX_PLATFORMS env)
                          os.environ["BENCH_PLATFORM"])
    f32 = os.environ.get("BENCH_F32", "0") == "1"
    if not f32:
        jax.config.update("jax_enable_x64", True)
    ncol = int(os.environ.get("BENCH_NCOL", "8192"))
    nsteps = int(os.environ.get("BENCH_STEPS", "12"))
    ndays = int(os.environ.get("BENCH_DAYS", "2"))
    use_scan = os.environ.get("BENCH_SCAN", "1") == "1"
    # windows per timed diurnal day: 48 half-hour steps / window length
    wpd = max(1, round(48 / nsteps)) if use_scan else 1
    # default = the production configuration AND the Model/RunConfig
    # default: f64 prognostics with f32 radiative solvers AND f32
    # canopy-loop interior AND warm-started solvers (drift-tested:
    # tests/test_mixed_radiation.py, test_mixed_canopy.py, and the
    # season-scale tools/mixed_canopy_drift.py evidence).  BENCH_MIXED=0
    # benches the reference-exact opt-out: pure-f64 solvers with
    # cold-start iteration sequences (r2/r3 regression row).
    mixed = os.environ.get("BENCH_MIXED", "1") == "1"
    warm = os.environ.get("BENCH_WARM", "1" if mixed else "0") == "1"
    mixed_can = os.environ.get("BENCH_MIXED_CANOPY",
                               "1" if mixed else "0") == "1"

    import jax.numpy as jnp
    import numpy as np
    from elmkernels_tpu.driver import step as step_mod
    from elmkernels_tpu.utils.dates import Date

    # Build host-side (eager ops on a tunnel backend round-trip per op),
    # then transfer the finished pytrees to the device once.
    # r4 methodology fix: r1-r3 re-ran ONE forcing window repeatedly,
    # which lets warm-started solvers converge onto the window's limit
    # cycle (iteration counts collapse; measured 0.72 ms/step vs
    # 4.2 ms under real diurnal forcing at ncol=8192).  The bench now
    # feeds CONSECUTIVE windows (a continuous diurnal sequence, no
    # repetition), so every config pays real day/night solver work.
    # The reference-exact opt-out is iteration-cold each step and
    # measures identically under both schemes (9.86 ms, = r2/r3).
    hetero = os.environ.get("BENCH_HETERO", "0") == "1"
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from elmkernels_tpu.driver.model import Model
        if hetero:
            # the flagship heterogeneous global grid, through the
            # PRODUCTION init path: a generated global surfdata NetCDF
            # (land-weighted latitudes, all 20 soil classes, texture
            # gradients, latitude-zoned C3/C4 PFT mix) loaded via
            # Model.from_surfdata — no hand-built parameter arrays
            # (VERDICT r3 item 5; reference initialize_elm_kokkos.cc)
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            from make_global_surfdata import ensure_surfdata
            model = Model.from_surfdata(ensure_surfdata(ncol), ncol)
        else:
            model = Model(ncol=ncol)
        if os.environ.get("BENCH_PACKED", "0") == "1":
            model.packed_carry = True
        date = Date.from_ymd(1985, 7, 1, 6 * 3600)
        if use_scan:
            # consecutive windows (compile, warmup, trace, then
            # ndays x wpd timed): a continuous diurnal forcing sequence
            # with no window ever repeated (see methodology note above)
            windows = []
            for _ in range(3 + ndays * wpd):
                windows.append(model.stack_windows(date, nsteps))
                date.increment_seconds(int(model.dtime) * nsteps)
            forc, phen = windows[0]
        else:
            forc = jax.tree.map(jnp.asarray,
                                model.forcing.window(date, model.dtime))
            phen = jax.tree.map(jnp.asarray, model.phenology.window(date))
            windows = [(forc, phen)] * (3 + ndays * wpd)
    land, psnveg, albveg, dtime = (model.land, model.psnveg, model.albveg,
                                   model.dtime)

    # PFT traits ride as jit arguments (for a heterogeneous grid they are
    # [ncol] arrays — closing over them would embed MB-scale constants)
    psn_mode = model.psn_mode
    if use_scan:
        def fn(snicar, params, pv, av, state, forc, phen):
            def body(st, fp):
                f, p = fp
                st, d = step_mod.advance(land, pv, av, snicar,
                                         params, st, f, p, dtime,
                                         mixed_radiation=mixed,
                                         warm_start=warm,
                                         mixed_canopy=mixed_can,
                                         psn_mode=psn_mode)
                return st, jnp.abs(d.errsol).max()
            return jax.lax.scan(body, state, (forc, phen))
        steps_per_call = nsteps
    else:
        def fn(snicar, params, pv, av, state, forc, phen):
            st, d = step_mod.advance(land, pv, av, snicar, params,
                                     state, forc, phen, dtime,
                                     mixed_radiation=mixed,
                                     warm_start=warm,
                                     mixed_canopy=mixed_can,
                                     psn_mode=psn_mode)
            return st, jnp.abs(d.errsol).max()
        steps_per_call = 1

    # BENCH_COMPILE_EFFORT=-1.0 trades a few % runtime for ~25% faster
    # XLA compile (measured f64: 462s -> 355s) — useful for dev loops;
    # production keeps default effort (the persistent cache amortizes it)
    copts = None
    if os.environ.get("BENCH_COMPILE_EFFORT"):
        copts = {"exec_time_optimization_effort":
                 float(os.environ["BENCH_COMPILE_EFFORT"])}
    step = jax.jit(fn, donate_argnums=(4,), compiler_options=copts)

    args = (model.snicar, model.params, model.psnveg,
            model.albveg, model.state, windows)
    default = jax.devices()[0]
    if default.platform != "cpu":
        args = jax.block_until_ready(jax.device_put(args, default))
    snicar, params, psnveg, albveg, state, windows = args
    wins = iter(windows)
    forc, phen = next(wins)

    def pull(state):
        """Force full pipeline sync with a scalar device->host read."""
        return float(jax.device_get(state.t_grnd[0]))

    t0 = time.time()
    state, errsol = step(snicar, params, psnveg, albveg, state,
                         forc, phen)
    pull(state)
    compile_s = time.time() - t0
    print(f"# compile+first call: {compile_s:.1f}s  ncol={ncol} "
          f"dtype={'f32' if f32 else 'f64'} "
          f"mode={'scan' if use_scan else 'dispatch'}x{steps_per_call}"
          f"{' mixed-radiation' if mixed else ''}"
          f"{' warm-start' if warm else ''}"
          f"{' mixed-canopy' if mixed_can else ''}",
          file=sys.stderr)

    def window(state, ncalls):
        t0 = time.time()
        for _ in range(ncalls):
            if use_scan:
                f, p = next(wins)   # fresh consecutive forcing
            else:
                f, p = forc, phen
            state, errsol = step(snicar, params, psnveg, albveg, state,
                                 f, p)
        pull(state)
        return time.time() - t0, state, errsol

    # warmup (also drains any queued work)
    _, state, _ = window(state, 1)

    if os.environ.get("BENCH_TRACE"):
        with jax.profiler.trace(os.environ["BENCH_TRACE"]):
            _, state, _ = window(state, 1)
    elif use_scan:
        next(wins)  # keep the window schedule fixed trace-or-not

    # fixed sync overhead: a scalar device->host pull on ready state
    # (on the remote tunnel this is a full RTT — the constant the r4
    # short/long differential was built to cancel, now measured
    # directly and subtracted per window)
    pull_samples = []
    for _ in range(7):
        t0 = time.time()
        pull(state)
        pull_samples.append(time.time() - t0)
    pull_s = sorted(pull_samples)[len(pull_samples) // 2]

    ncalls = max(1, nsteps // steps_per_call) if not use_scan else 1
    wtimes = []   # per-window wall times, pull-corrected
    errsol_v = 0.0
    for _ in range(ndays * wpd):
        t_i, state, errsol = window(state, ncalls)
        wtimes.append(max(t_i - pull_s, 0.0))
        errsol_v = max(errsol_v, float(np.max(np.asarray(errsol))))
    spw = ncalls * steps_per_call            # steps per window
    steps_per_day = wpd * spw
    day_totals = [sum(wtimes[d * wpd:(d + 1) * wpd])
                  for d in range(ndays)]
    # headline: best full-day total / steps-in-a-day — every diurnal
    # phase counted exactly once per day, so window-content variance
    # (day vs night iteration counts) cannot bias the estimate;
    # best-of-days drops host/tunnel jitter (which only adds time),
    # never solver work
    per_step = min(day_totals) / steps_per_day
    cols_per_s = ncol / per_step

    errsol = errsol_v
    med = sorted(wtimes)[len(wtimes) // 2] / spw
    print(f"# per-step: {per_step*1e3:.2f} ms best-of-{ndays}-days "
          f"(day totals {[round(t, 3) for t in day_totals]} s / "
          f"{steps_per_day} steps each; per-window ms/step "
          f"{[round(t / spw * 1e3, 2) for t in wtimes]}; median window "
          f"{med*1e3:.2f}; pull {pull_s*1e3:.1f} ms), "
          f"errsol_max={errsol:.2e}", file=sys.stderr)
    try:  # HBM footprint (per-chip capacity accounting, BASELINE.md)
        ms = default.memory_stats()
        if ms:
            print(f"# hbm: peak {ms.get('peak_bytes_in_use', 0)/2**30:.2f}"
                  f" GiB / {ms.get('bytes_limit', 0)/2**30:.2f} GiB limit"
                  f" ({ms.get('peak_bytes_in_use', 0)/ncol:.0f} B/col"
                  f" peak)", file=sys.stderr)
    except Exception:
        pass
    print(json.dumps({
        "metric": "full-step gridcell-columns/s per chip",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": 1.0,
    }))
    # batch-scaled conservation contract (tested in test_config_guard):
    # a shortwave-closure regression at scale fails the bench loudly
    if mixed and not f32:
        from elmkernels_tpu.utils.guard import errsol_bound
        bound = errsol_bound(ncol)
        if not errsol <= bound:
            print(f"# CONTRACT VIOLATION: errsol_max {errsol:.3e} > "
                  f"errsol_bound({ncol}) = {bound:.3e}", file=sys.stderr)
            sys.exit(2)


if __name__ == "__main__":
    main()
