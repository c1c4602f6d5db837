#!/usr/bin/env python3
"""Single-column demo run — the reference's ``kokkos_driver.cc:27-91``:
start 1985-07-01 12:00, 100 x 1800 s steps, print prognostics each step.

Usage: python examples/run_single_column.py [--ncol N] [--steps N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=1)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--platform", default=None,
                    help="force backend, e.g. 'cpu' (the env var "
                         "JAX_PLATFORMS is overridden by site config)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.utils.dates import Date

    # build host-side; eager ops on a remote accelerator round-trip per op
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = Model(ncol=args.ncol)
    start = Date.from_ymd(1985, 7, 1, 12 * 3600)

    def report(date, state, diags):
        i = 0  # column 0, like the reference's single-cell print
        print(f"{date.year:04d}-{date.doy + 1:03d} {date.sec:5d}  "
              f"t_grnd={float(state.t_grnd[i]):8.3f}  "
              f"h2osno={float(state.h2osno[i]):9.4f}  "
              f"h2ocan={float(state.h2ocan[i]):7.4f}  "
              f"snl={int(state.snl[i])}  "
              f"fsa={float(diags.fsa[i]):8.2f}  "
              f"eflx_sh={float(diags.eflx_sh_tot[i]):8.2f}  "
              f"qflx_evap={float(diags.qflx_evap_tot[i]):.3e}  "
              f"errh2o={float(diags.errh2o[i]):+.2e}  "
              f"errseb={float(diags.errseb[i]):+.2e}")

    last = model.run(start, args.steps, callback=report)
    print(f"final errsol_max={float(np.abs(np.asarray(last.errsol)).max()):.2e}")


if __name__ == "__main__":
    main()
