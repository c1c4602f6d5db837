#!/usr/bin/env python3
"""Per-chip capacity probe — BASELINE.json config 5 (VERDICT r3 item 3 /
r4 item 2): how many columns fit one chip, and the full-step rate at
~1M heterogeneous columns.

Initializes through the production ``Model.from_surfdata`` path on the
generated global surfdata grid, pre-stages ONE 48-step series-ingest
window on device (pre-staged = pure compute; the tunnel link would
otherwise dominate and is measured separately in the ingest table),
runs the production scan-series executable, and reports:

  ms/step, columns/s, errsol_max vs errsol_bound(ncol),
  HBM peak / limit, peak bytes/column (the capacity formula input)

  CAP_NCOL   columns (default 1048576)
  CAP_STEPS  steps in the window (default 48)
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


def main():
    import numpy as np

    from make_global_surfdata import ensure_surfdata

    from elmkernels_tpu.driver.model import Model, _jitted_scan_series
    from elmkernels_tpu.utils.dates import Date
    from elmkernels_tpu.utils.guard import errsol_bound

    if os.environ.get("CAP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CAP_PLATFORM"])
    ncol = int(os.environ.get("CAP_NCOL", str(1 << 20)))
    nsteps = int(os.environ.get("CAP_STEPS", "48"))

    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        model = Model.from_surfdata(ensure_surfdata(ncol), ncol)
        # mid-winter start exercises the heterogeneous regimes (snow,
        # terminator, southern summer) like the long run does
        start = Date.from_ymd(1985, 1, 15)
        payload = model._host_series(start, nsteps)
    t_init = time.time() - t0
    print(f"# init+host-window: {t_init:.1f}s", file=sys.stderr)

    default = jax.devices()[0]
    t0 = time.time()
    if default.platform != "cpu":
        model.state = jax.block_until_ready(
            jax.device_put(model.state, default))
        model.params = jax.block_until_ready(
            jax.device_put(model.params, default))
        payload = jax.block_until_ready(jax.device_put(payload, default))
    t_h2d = time.time() - t0
    print(f"# H2D staging: {t_h2d:.1f}s", file=sys.stderr)

    ser, steps, (phen_uniq, phen_steps), aero = payload

    def run(state):
        return _jitted_scan_series(
            model.land, model.dtime, model.elm_correct_snow_aging,
            model.psn_mode, False, model.mixed_radiation,
            model.elm_correct_seb, model.warm_start, model.het_ltype,
            model.mixed_canopy, model.packed_carry, model.snicar,
            model.params, model.psnveg, model.albveg, state, ser, steps,
            phen_uniq, phen_steps, aero)

    t0 = time.time()
    state, diags = run(model.state)
    float(jax.device_get(state.t_grnd[0]))
    print(f"# compile+first window: {time.time() - t0:.1f}s",
          file=sys.stderr)

    # timed: re-run the SAME pre-staged window (state donation means the
    # second run continues from the first's end state — fine, the grid
    # regime doesn't change in 24 h)
    t0 = time.time()
    state, diags = run(state)
    float(jax.device_get(state.t_grnd[0]))
    wall = time.time() - t0

    errsol = float(np.abs(np.asarray(diags.errsol_max)).max())
    led = float(np.abs(np.asarray(diags.errh2o_led_max)).max())
    per_step = wall / nsteps
    hbm = {}
    try:
        ms = default.memory_stats()
        if ms:
            hbm = {"hbm_peak_gib": round(
                       ms.get("peak_bytes_in_use", 0) / 2**30, 2),
                   "hbm_limit_gib": round(
                       ms.get("bytes_limit", 0) / 2**30, 2),
                   "peak_bytes_per_col": round(
                       ms.get("peak_bytes_in_use", 0) / ncol)}
    except Exception:
        pass
    print(json.dumps({
        **hbm, "ncol": ncol, "nsteps": nsteps,
        "ms_per_step": round(per_step * 1e3, 2),
        "cols_per_s": round(ncol / per_step),
        "errsol_max": errsol, "errsol_bound": errsol_bound(ncol),
        "errh2o_led_max": led,
        "init_s": round(t_init, 1), "h2d_s": round(t_h2d, 1)}))


if __name__ == "__main__":
    main()
