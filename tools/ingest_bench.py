#!/usr/bin/env python3
"""Measure the windowed-ingest overlap at scale (VERDICT r2 item 7).

Compares steady-state per-step wall time of:
  - ``Model.run_scan``    — the whole [nsteps, ncol] forcing stack
    host-assembled and transferred up front (no ingest during compute);
  - ``Model.run_windows`` — production ingest loop: the NEXT window's
    host assembly + H2D double-buffered against the CURRENT window's
    device compute (``driver/model.py``).

Equal per-step times demonstrate zero-stall ingest; the windowed loop's
overhead is reported as a ratio.  Run on the TPU:

  IB_NCOL=65536 python tools/ingest_bench.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/elmtpu_jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)


def main():
    if os.environ.get("IB_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["IB_PLATFORM"])
    ncol = int(os.environ.get("IB_NCOL", "65536"))
    window = int(os.environ.get("IB_WINDOW", "48"))
    nwin = int(os.environ.get("IB_NWIN", "4"))

    from elmkernels_tpu.utils.dates import Date

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from elmkernels_tpu.driver.model import Model
        model = Model(ncol=ncol)
    start = Date.from_ymd(1985, 7, 1)

    default = jax.devices()[0]
    if default.platform != "cpu":
        model.state = jax.block_until_ready(
            jax.device_put((model.state), default))
        model.params = jax.block_until_ready(
            jax.device_put((model.params), default))

    def pull():
        return float(jax.device_get(model.state.t_grnd[0]))

    # compile (one window-shaped scan executable shared by both paths)
    t0 = time.time()
    model.run_scan(start, window)
    pull()
    print(f"# compile+first window: {time.time() - t0:.1f}s "
          f"ncol={ncol} window={window}", file=sys.stderr)

    # pre-staged: forcing for all windows assembled and on device BEFORE
    # the clock starts — pure compute
    date = start.copy()
    date.increment_seconds(int(model.dtime) * window)
    stacks = []
    for _ in range(nwin):
        f, p = model.host_windows(date, window)
        stacks.append(jax.block_until_ready(jax.device_put((f, p))))
        date.increment_seconds(int(model.dtime) * window)
    from elmkernels_tpu.driver.model import _jitted_scan
    t0 = time.time()
    for f, p in stacks:
        model.state, _ = _jitted_scan(
            model.land, model.dtime, model.elm_correct_snow_aging,
            model.psn_mode, getattr(model.forcing, "qbot_is_rh", False),
            model.mixed_radiation, model.elm_correct_seb,
            model.warm_start, model.het_ltype, model.mixed_canopy,
            model.snicar, model.params,
            model.psnveg, model.albveg, model.state, f, p)
    pull()
    t_scan = (time.time() - t0) / (nwin * window)

    # overlapped: host assembly + H2D of window k+1 runs against window
    # k's device compute
    t0 = time.time()
    model.run_windows(date, nwin * window, window=window)
    pull()
    t_win = (time.time() - t0) / (nwin * window)

    # overlapped SERIES layout: same trajectories bit-for-bit, the
    # forcing ships as raw forcing-grid samples + per-step indices
    # (~dtf/dt-fold fewer bytes; compile its executable off the clock)
    model.run_windows(date, window, window=window, series=True)
    pull()
    t0 = time.time()
    model.run_windows(date, nwin * window, window=window, series=True)
    pull()
    t_ser = (time.time() - t0) / (nwin * window)

    overhead = t_win / t_scan - 1.0
    overhead_s = t_ser / t_scan - 1.0
    print(f"# pre-staged {t_scan * 1e3:.2f} ms/step | overlapped "
          f"{t_win * 1e3:.2f} ms/step ({overhead * 100:+.1f}%) | "
          f"overlapped-series {t_ser * 1e3:.2f} ms/step "
          f"({overhead_s * 100:+.1f}%)", file=sys.stderr)
    import json
    print(json.dumps({"ncol": ncol, "window": window,
                      "prestaged_ms": round(t_scan * 1e3, 3),
                      "overlapped_ms": round(t_win * 1e3, 3),
                      "overlapped_series_ms": round(t_ser * 1e3, 3),
                      "overhead_pct": round(overhead * 100, 2),
                      "series_overhead_pct": round(overhead_s * 100, 2)}))


if __name__ == "__main__":
    main()
