#!/usr/bin/env python3
"""Capture a jax.profiler trace of the full coupled step on the default
backend and print canopy-iteration statistics.

Usage: PROF_NCOL=8192 PROF_F32=1 python tools/profile_step.py [outdir]
Then:  python tools/analyze_trace.py <outdir>
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


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    f32 = os.environ.get("PROF_F32", "1") == "1"
    if not f32:
        jax.config.update("jax_enable_x64", True)
    ncol = int(os.environ.get("PROF_NCOL", "8192"))
    nsteps = int(os.environ.get("PROF_STEPS", "3"))

    import jax.numpy as jnp
    import numpy as np
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

    def fn(snicar, params, state, forc, phen):
        return step_mod.advance(land, psnveg, albveg, snicar, params, state,
                                forc, phen, dtime)

    step = jax.jit(fn)
    args = (model.snicar, model.params, model.state, forc, phen)
    default = jax.devices()[0]
    if default.platform != "cpu":
        args = jax.block_until_ready(jax.device_put(args, default))
    snicar, params, state, forc, phen = args

    t0 = time.time()
    state, diags = step(snicar, params, state, forc, phen)
    jax.block_until_ready(state)
    print(f"# compile+first: {time.time()-t0:.1f}s ncol={ncol} "
          f"f32={f32}", file=sys.stderr)

    it = np.asarray(diags.niters_canopy)
    print(f"# canopy iters: min={it.min()} p50={np.percentile(it,50):.0f} "
          f"p90={np.percentile(it,90):.0f} p99={np.percentile(it,99):.0f} "
          f"max={it.max()} mean={it.mean():.2f}", file=sys.stderr)

    with jax.profiler.trace(outdir):
        for _ in range(nsteps):
            state, diags = step(snicar, params, state, forc, phen)
        jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(nsteps):
        state, diags = step(snicar, params, state, forc, phen)
    jax.block_until_ready(state)
    per = (time.time() - t0) / nsteps
    print(f"# per-step {per*1e3:.1f} ms -> {ncol/per:,.0f} col/s",
          file=sys.stderr)
    it = np.asarray(diags.niters_canopy)
    print(f"# canopy iters (later step): p50={np.percentile(it,50):.0f} "
          f"max={it.max()} mean={it.mean():.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
