#!/usr/bin/env python3
"""Benchmark: full coupled water+energy step throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md): this run
*establishes* the baseline, so vs_baseline is reported as 1.0.

Config (BASELINE.json config 4): batched columns, full physics step,
multi-step steady-state timing.  Environment knobs:
  BENCH_NCOL   columns (default 8192)
  BENCH_STEPS  timed steps (default 10)
  BENCH_F32    set to 1 to run single precision (default f64)
"""

import json
import os
import sys
import time

import jax


def main():
    f32 = os.environ.get("BENCH_F32", "0") == "1"
    if not f32:
        jax.config.update("jax_enable_x64", True)
    ncol = int(os.environ.get("BENCH_NCOL", "8192"))
    nsteps = int(os.environ.get("BENCH_STEPS", "10"))

    import jax.numpy as jnp
    from elmkernels_tpu.driver import step as step_mod
    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.utils.dates import Date

    model = Model(ncol=ncol)
    date = Date.from_ymd(1985, 7, 1, 6 * 3600)
    forc = jax.tree.map(jnp.asarray, model.forcing.window(date, model.dtime))
    phen = jax.tree.map(jnp.asarray, model.phenology.window(date))
    land, psnveg, albveg, dtime = (model.land, model.psnveg, model.albveg,
                                   model.dtime)

    def fn(snicar, params, state, forc, phen):
        return step_mod.advance(land, psnveg, albveg, snicar, params, state,
                                forc, phen, dtime)

    step = jax.jit(fn, donate_argnums=(2,))

    t0 = time.time()
    state, diags = step(model.snicar, model.params, model.state, forc, phen)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    print(f"# compile+first step: {compile_s:.1f}s  ncol={ncol} "
          f"dtype={'f32' if f32 else 'f64'}", file=sys.stderr)

    # warmup
    for _ in range(2):
        state, diags = step(model.snicar, model.params, state, forc, phen)
    jax.block_until_ready(state)

    t0 = time.time()
    for _ in range(nsteps):
        state, diags = step(model.snicar, model.params, state, forc, phen)
    jax.block_until_ready(state)
    per_step = (time.time() - t0) / nsteps
    cols_per_s = ncol / per_step

    print(f"# per-step: {per_step*1e3:.1f} ms, errsol_max="
          f"{float(abs(diags.errsol).max()):.2e}", file=sys.stderr)
    print(json.dumps({
        "metric": "full-step gridcell-columns/s per chip",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
