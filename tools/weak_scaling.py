#!/usr/bin/env python3
"""Weak-scaling harness (BASELINE.md config 5): fixed columns-per-device,
grow the mesh, report efficiency vs the 1-device rate.

Columns are halo-free data-parallel (SURVEY.md §2e) so the expected
efficiency is ~100% minus dispatch overhead; the reference's analog is
its per-rank MPI block decomposition with zero inter-rank physics
communication.

On a development host this runs on virtual CPU devices
(``--platform cpu`` sets ``xla_force_host_platform_device_count``), which
measures the sharding/dispatch machinery, not chip throughput; on a real
pod slice the same script reports true weak scaling.

Usage: python tools/weak_scaling.py [--cols-per-dev 256] [--steps 5]
                                    [--devices 1 2 4 8] [--platform cpu]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols-per-dev", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={max(args.devices)}")
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from elmkernels_tpu.driver import step as step_mod
    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.parallel import mesh as pmesh
    from elmkernels_tpu.utils.dates import Date

    results = []
    for ndev in args.devices:
        ncol = args.cols_per_dev * ndev
        devices = jax.devices()[:ndev]
        assert len(devices) == ndev, f"need {ndev} devices"
        mesh = pmesh.column_mesh(devices)

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            model = Model(ncol=ncol)
            date = Date.from_ymd(1985, 7, 1, 6 * 3600)
            forc = jax.tree.map(jnp.asarray,
                                model.forcing.window(date, model.dtime))
            phen = jax.tree.map(jnp.asarray, model.phenology.window(date))

        state = pmesh.shard_state(mesh, model.state)
        params = pmesh.shard_params(mesh, model.params, ncol)
        forc = pmesh.shard_forcing(mesh, forc, ncol)
        land, psnveg, albveg, dtime = (model.land, model.psnveg,
                                       model.albveg, model.dtime)

        def fn(snicar, params, state, forc, phen):
            return step_mod.advance(land, psnveg, albveg, snicar, params,
                                    state, forc, phen, dtime)

        step = jax.jit(fn, donate_argnums=(2,))
        state, _ = step(model.snicar, params, state, forc, phen)  # compile
        float(jax.device_get(state.t_grnd[0]))

        t0 = time.time()
        for _ in range(args.steps):
            state, diags = step(model.snicar, params, state, forc, phen)
        float(jax.device_get(state.t_grnd[0]))  # full sync
        per_step = (time.time() - t0) / args.steps
        rate = ncol / per_step
        results.append({"devices": ndev, "ncol": ncol,
                        "per_step_ms": round(per_step * 1e3, 2),
                        "columns_per_s": round(rate, 1)})
        print(f"# {ndev} dev  ncol={ncol}  {per_step*1e3:7.1f} ms/step  "
              f"{rate:12.0f} col/s", file=sys.stderr)

    base = results[0]["columns_per_s"] / results[0]["devices"]
    for r in results:
        r["efficiency"] = round(
            r["columns_per_s"] / r["devices"] / base, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
