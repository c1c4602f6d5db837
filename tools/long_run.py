#!/usr/bin/env python3
"""Long integration on the heterogeneous global grid (VERDICT r3 item 4).

Runs >= one simulated month (1,488 x 1800 s steps; a year = 17,520) on
the surfdata-initialized heterogeneous grid through the production
ingest loop (``run_windows(series=True)``), with:

- StepGuard active per window (batch-scaled conservation contract);
- JSONL metrics per window (``MetricsLogger.log_window``);
- periodic history output (column-subsampled NetCDF);
- a mid-run checkpoint, and after the run a RESUME VERIFICATION: the
  checkpoint is restored into a fresh model, the tail windows re-run,
  and the final state asserted bit-identical to the original run.

The reference's longest run is 1,008 serial steps with printed-only
conservation errors (``whole_system.cc:89``); this exceeds it by an
order of magnitude with asserted invariants.

  LR_NCOL=262144 LR_STEPS=1488 python tools/long_run.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/elmtpu_jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)


class _ColSlice:
    """Column-subsampled view of a state/diags pytree for history output
    (writing all ~262k columns per step would be GB-scale; the history
    file records a representative latitude transect)."""

    def __init__(self, obj, idx):
        self._obj, self._idx = obj, idx

    def __getattr__(self, name):
        import numpy as np
        v = getattr(self._obj, name)
        return np.asarray(v)[self._idx]


def main():
    import numpy as np

    from make_global_surfdata import ensure_surfdata

    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.utils import checkpoint
    from elmkernels_tpu.utils.dates import Date
    from elmkernels_tpu.utils.guard import StepGuard
    from elmkernels_tpu.utils.history import HistoryWriter
    from elmkernels_tpu.utils.metrics import MetricsLogger

    if os.environ.get("LR_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["LR_PLATFORM"])
    ncol = int(os.environ.get("LR_NCOL", "262144"))
    nsteps = int(os.environ.get("LR_STEPS", "1488"))
    window = int(os.environ.get("LR_WINDOW", "48"))
    outdir = Path(os.environ.get("LR_OUT", "/tmp/elmtpu_longrun"))
    nsteps -= nsteps % window
    nwin = nsteps // window
    ck_win = int(os.environ.get("LR_CK_WIN", str(max(1, nwin - 3))))
    outdir.mkdir(parents=True, exist_ok=True)

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        model = Model.from_surfdata(ensure_surfdata(ncol), ncol)
    print(f"# model init (from_surfdata, ncol={ncol}): "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    default = jax.devices()[0]
    if default.platform != "cpu":
        model.state = jax.block_until_ready(
            jax.device_put(model.state, default))
        model.params = jax.block_until_ready(
            jax.device_put(model.params, default))

    start = Date.from_ymd(1985, 1, 1)
    # errh2o is the OPEN column balance: rain exported to the external
    # hydrology model (qflx_top_soil — the ATS coupling design) shows up
    # there by construction and scales with precipitation, so it is not
    # an invariant to guard on over a global grid with wet seasons.
    # errh2osno (the reference's printed snow-balance view) is NOT an
    # invariant: it charges the CURRENT step's evaporative fluxes and
    # the post-combine snow fraction while the pack was debited with
    # the PREVIOUS step's partition at the pre-hydrology fraction (the
    # reference's one-step-lag design), so it reads ~1e-4..4e-3 mm
    # whenever a layered pack exists — not only at transitions, as an
    # earlier comment here claimed (r5 measurement,
    # tests/test_snow_balance_guard.py).  The guard instead watches
    # errh2osno_steady — the same balance re-timed to the applied
    # fluxes and masked on snl transitions — which closes to ~1e-15
    # when healthy, plus the CLOSED ledger (errh2o_led), which caught
    # two real reference bugs in r4.
    # ledger bound: the per-step max over ncol columns of f64 rounding
    # through ~45 mm rain fluxes reaches ~1e-9 at 262k columns (measured
    # 1.3e-9; 3.6e-10 at 1024).  1e-7 keeps 7 orders of margin below the
    # 0.9 mm leak class this ledger caught while not tripping on
    # batch-scaled rounding.
    # errsol: the horizon-scaled contract — a long run draws the
    # 48-step-window max every window, so the bound must cover the max
    # over ncol x nsteps samples, not one calibration window (the r5
    # 80-day 262k run's seasonal rise to 3.8e-5 exceeded what any
    # single July window shows; utils/guard.errsol_bound docstring)
    from elmkernels_tpu.utils.guard import errsol_bound
    guard = StepGuard(ncol=ncol, every=1, errh2o_max=None,
                      errh2osno_max=None, errh2osno_steady_max=1e-7,
                      errsol_max=errsol_bound(ncol, nsteps),
                      errh2o_led_max=1e-7)
    guard.snapshot(model.state)
    metrics = MetricsLogger(outdir / "metrics.jsonl")
    hist_idx = np.linspace(0, ncol - 1, 64).astype(int)
    # state fields on a 64-column latitude transect (window errors and
    # flux means are already in the JSONL metrics stream)
    hist = HistoryWriter(str(outdir / "history.nc"),
                         fields=("t_grnd", "h2osno", "snow_depth",
                                 "t_veg"),
                         every=8)
    ck_path = str(outdir / "ckpt")
    ck_state = {}
    records = []

    t_compile = time.time()
    win_i = [0]

    def cb(date, state, diags):
        win_i[0] += 1
        rec = metrics.log_window(date, state, diags)
        records.append(rec)
        rep = guard.check(state, diags)
        if not rep.ok:
            raise SystemExit(f"guard tripped at window {win_i[0]}: "
                             f"{rep.reasons}")
        if win_i[0] % 8 == 0 or win_i[0] == nwin:
            hist.record(date, _ColSlice(state, hist_idx), diags)
        if win_i[0] == ck_win:
            t = time.time()
            checkpoint.save(ck_path, jax.tree.map(np.asarray, state))
            ck_state["date"] = date.copy()
            ck_state["t"] = time.time() - t
        if win_i[0] == 1:
            print(f"# compile+first window: {time.time() - t_compile:.1f}s",
                  file=sys.stderr)
        if win_i[0] % 16 == 0:
            print(f"# window {win_i[0]}/{nwin}  "
                  f"errh2o_led={rec['errh2o_led_max']:.2e} "
                  f"errsol={rec['errsol_max']:.2e} "
                  f"t_grnd={rec['t_grnd_mean']:.2f}", file=sys.stderr)

    t_run = time.time()
    model.run_windows(start, nsteps, window=window, series=True,
                      callback=cb)
    jax.block_until_ready(model.state.t_grnd)
    wall = time.time() - t_run
    hist.close()
    metrics.close()

    # conservation trend: the ledger must not degrade over the run
    q = max(1, len(records) // 4)
    led_first = max(r["errh2o_led_max"] for r in records[:q])
    led_last = max(r["errh2o_led_max"] for r in records[-q:])
    sol_max = max(r["errsol_max"] for r in records)

    # resume verification: restore the checkpoint, re-run the tail,
    # assert bit-identity with the original run's final state
    t = time.time()
    with jax.default_device(cpu):
        model2 = Model.from_surfdata(ensure_surfdata(ncol), ncol)
    restored = checkpoint.restore(ck_path, like=model2.state)
    model2.state = jax.device_put(restored, default) \
        if default.platform != "cpu" else restored
    if default.platform != "cpu":
        model2.params = jax.block_until_ready(
            jax.device_put(model2.params, default))
    tail = nsteps - ck_win * window
    model2.run_windows(ck_state["date"], tail, window=window, series=True)
    jax.block_until_ready(model2.state.t_grnd)
    mism = [n for n, a in zip(model.state._fields, model.state)
            if not np.array_equal(np.asarray(a),
                                  np.asarray(getattr(model2.state, n)))]
    resume_s = time.time() - t
    if mism:
        raise SystemExit(f"resume NOT bit-identical: {mism}")

    per_step = wall / nsteps
    hbm = {}
    try:
        ms = default.memory_stats()
        if ms:
            hbm = {"hbm_peak_gib": round(
                       ms.get("peak_bytes_in_use", 0) / 2**30, 2),
                   "hbm_limit_gib": round(
                       ms.get("bytes_limit", 0) / 2**30, 2),
                   "hbm_peak_bytes_per_col": round(
                       ms.get("peak_bytes_in_use", 0) / ncol)}
    except Exception:
        pass
    print(json.dumps({
        **hbm,
        "ncol": ncol, "nsteps": nsteps, "window": window,
        "sim_days": nsteps * model.dtime / 86400.0,
        "wall_s": round(wall, 1), "ms_per_step": round(per_step * 1e3, 2),
        "cols_per_s": round(ncol / per_step, 0),
        "errh2o_led_max_first_quarter": led_first,
        "errh2o_led_max_last_quarter": led_last,
        "errsol_max": sol_max,
        "guard_failures": len(guard.failures),
        "checkpoint_s": round(ck_state.get("t", 0.0), 1),
        "resume_bit_identical": not mism,
        "resume_verify_s": round(resume_s, 1),
        "history_files": len(hist.written),
        "metrics_windows": len(records)}))


if __name__ == "__main__":
    main()
