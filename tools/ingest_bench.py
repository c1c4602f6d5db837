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

``IB_FILES=1`` switches to the REAL-file mode (VERDICT r3 item 1):
month-per-file NetCDF forcing is generated with
``tools/make_forcing_files.py`` (reference layout), read through the
native C++ reader (``native/elmio.cc``) with next-month prefetch, and
``run_windows(series=True)`` runs end-to-end from the files — timed
against the pre-staged series compute and checked bit-identical to it.
The host-assembly cost (file read + numpy series build, no device) is
timed separately so the link cost can be attributed
(BASELINE.md r3 ingest section).  Knobs: IB_NLON (default 256),
IB_FORCDIR (reuse an existing generated dir).
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


def bench_files(ncol: int, window: int, nwin: int):
    """Real-file series ingest: generate reference-layout month files,
    run ``run_windows(series=True)`` end-to-end through the native
    reader + prefetch, versus the pre-staged series compute."""
    import json
    import pathlib

    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from make_forcing_files import write_months

    from elmkernels_tpu.io import native
    from elmkernels_tpu.utils.dates import Date

    nlon = int(os.environ.get("IB_NLON", "256"))
    nlat = (ncol + nlon - 1) // nlon
    forcdir = os.environ.get(
        "IB_FORCDIR", f"/tmp/elmtpu_forc_{nlat}x{nlon}")
    base = str(pathlib.Path(forcdir) / "forc_")
    if not pathlib.Path(f"{base}1985-07.nc").exists():
        pathlib.Path(forcdir).mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        write_months(base, 1985, 7, 2, nlat, nlon)  # Jul + Aug (bridge)
        print(f"# generated 2 month files ({nlat}x{nlon} grid) in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    fsize = os.path.getsize(f"{base}1985-07.nc")
    print(f"# forcing file: {fsize / 1e6:.1f} MB/month, native reader: "
          f"{native.available()}", file=sys.stderr)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from elmkernels_tpu.driver.model import Model
        m_pre = Model(ncol=ncol, forcing_basename=base)
        m_ovl = Model(ncol=ncol, forcing_basename=base)
    start = Date.from_ymd(1985, 7, 1)

    default = jax.devices()[0]
    if default.platform != "cpu":
        for m in (m_pre, m_ovl):
            m.state = jax.block_until_ready(
                jax.device_put(m.state, default))
            m.params = jax.block_until_ready(
                jax.device_put(m.params, default))

    def pull(m):
        return float(jax.device_get(m.state.t_grnd[0]))

    # host-assembly cost alone (file read + numpy series build, zero
    # device work): cold = includes the month-file read; warm = cached
    t0 = time.time()
    m_pre._host_series(start, window)
    t_host_cold = time.time() - t0
    t0 = time.time()
    payload0 = m_pre._host_series(start, window)
    t_host_warm = time.time() - t0
    nbytes = sum(a.nbytes for a in jax.tree.leaves(payload0))
    print(f"# host series assembly: cold {t_host_cold:.3f}s / warm "
          f"{t_host_warm:.3f}s per {window}-step window; payload "
          f"{nbytes / 1e6:.1f} MB", file=sys.stderr)

    # compile the series executable (off the clock)
    t0 = time.time()
    m_pre.run_scan_series(start, window)
    pull(m_pre)
    print(f"# compile+first window: {time.time() - t0:.1f}s ncol={ncol} "
          f"window={window}", file=sys.stderr)

    # pre-staged: all series payloads assembled + on device up front
    from elmkernels_tpu.driver.model import _jitted_scan_series
    date = start.copy()
    date.increment_seconds(int(m_pre.dtime) * window)
    payloads = []
    for _ in range(nwin):
        p = m_pre._host_series(date, window)
        payloads.append(jax.block_until_ready(jax.device_put(p)))
        date.increment_seconds(int(m_pre.dtime) * window)
    statics = (m_pre.land, m_pre.dtime, m_pre.elm_correct_snow_aging,
               m_pre.psn_mode, getattr(m_pre.forcing, "qbot_is_rh", False),
               m_pre.mixed_radiation, m_pre.elm_correct_seb,
               m_pre.warm_start, m_pre.het_ltype, m_pre.mixed_canopy,
               m_pre.packed_carry)
    t0 = time.time()
    for ser, steps, (pu, psx), au in payloads:
        m_pre.state, _ = _jitted_scan_series(
            *statics, m_pre.snicar, m_pre.params, m_pre.psnveg,
            m_pre.albveg, m_pre.state, ser, steps, pu, psx, au)
    pull(m_pre)
    t_pre = (time.time() - t0) / (nwin * window)

    # overlapped: files -> native reader (+ prefetch) -> series payload
    # -> H2D, double-buffered against device compute
    m_ovl.run_scan_series(start, window)  # same warmup trajectory
    pull(m_ovl)
    t0 = time.time()
    m_ovl.run_windows(date_start(start, m_ovl.dtime, window),
                      nwin * window, window=window, series=True)
    pull(m_ovl)
    t_ovl = (time.time() - t0) / (nwin * window)

    # bit-identity: both models advanced the identical 1+nwin windows
    same = np.array_equal(np.asarray(jax.device_get(m_pre.state.t_grnd)),
                          np.asarray(jax.device_get(m_ovl.state.t_grnd)))
    overhead = t_ovl / t_pre - 1.0
    print(f"# pre-staged {t_pre * 1e3:.2f} ms/step | overlapped-files "
          f"{t_ovl * 1e3:.2f} ms/step ({overhead * 100:+.1f}%) | "
          f"bit-identical: {same}", file=sys.stderr)
    print(json.dumps({
        "mode": "files", "ncol": ncol, "window": window,
        "file_mb_per_month": round(fsize / 1e6, 1),
        "host_assembly_cold_s": round(t_host_cold, 3),
        "host_assembly_warm_s": round(t_host_warm, 3),
        "payload_mb_per_window": round(nbytes / 1e6, 2),
        "prestaged_ms": round(t_pre * 1e3, 3),
        "overlapped_files_ms": round(t_ovl * 1e3, 3),
        "overhead_pct": round(overhead * 100, 2),
        "bit_identical": bool(same)}))
    if not same:
        raise SystemExit("overlapped file ingest diverged from pre-staged")


def date_start(start, dtime, window):
    d = start.copy()
    d.increment_seconds(int(dtime) * window)
    return d


def main():
    if os.environ.get("IB_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["IB_PLATFORM"])
    ncol = int(os.environ.get("IB_NCOL", "65536"))
    window = int(os.environ.get("IB_WINDOW", "48"))
    nwin = int(os.environ.get("IB_NWIN", "4"))

    if os.environ.get("IB_FILES", "0") == "1":
        bench_files(ncol, window, nwin)
        return

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
            model.packed_carry, model.snicar, model.params,
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
