#!/usr/bin/env python3
"""Single-precision sanity: run N coupled steps in f32 and report
finiteness, physical ranges, and conservation-error degradation vs the
f64 contract (f64 closes errsol/errlon to ~1e-14; f32 must stay below
~1e-3 W/m² to be usable for production TPU throughput runs).

Run in its own process — x64 is a global JAX switch.

Usage: python tools/f32_check.py [--ncol 64] [--steps 48] [--platform cpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=64)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    assert not jax.config.jax_enable_x64
    import numpy as np

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from elmkernels_tpu.driver.model import Model
        from elmkernels_tpu.utils.dates import Date
        model = Model(ncol=args.ncol)

    # winter start exercises the snow pack in f32
    diags = model.run_scan(Date.from_ymd(1985, 1, 1), args.steps)
    state = model.state

    report = {}
    ok = True
    for name, arr in zip(state._fields, state):
        a = np.asarray(arr)
        if a.dtype.kind == "f" and not np.all(np.isfinite(a)):
            report[f"nonfinite_{name}"] = int((~np.isfinite(a)).sum())
            ok = False
    t = np.asarray(state.t_soisno)
    active = t != 0.0
    if active.any() and not (t[active].min() > 150.0
                             and t[active].max() < 350.0):
        report["t_range"] = [float(t[active].min()), float(t[active].max())]
        ok = False

    errsol = float(np.max(np.asarray(diags.errsol_max)))
    errlon = float(np.max(np.asarray(diags.errlon_max)))
    errh2osno = float(np.max(np.asarray(diags.errh2osno_max)))
    report.update(dict(errsol_max=errsol, errlon_max=errlon,
                       errh2osno_max=errh2osno,
                       t_grnd_mean=float(np.asarray(state.t_grnd).mean())))
    if errsol > 1e-3 or errlon > 1e-3 or errh2osno > 1e-4:
        ok = False
    report["ok"] = ok
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
