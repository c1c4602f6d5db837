#!/usr/bin/env python3
"""Run the coupled model for N steps and dump the final state + per-step
reduced diagnostics to an .npz — in whatever precision this process is
configured for.

x64 is a process-global JAX switch, so the f32-vs-f64 drift comparison
(tests/test_f32_drift.py) runs this script twice in subprocesses:

    python tools/f32_traj.py --ncol 4 --steps 720 --out /tmp/f32.npz
    python tools/f32_traj.py --x64 --ncol 4 --steps 720 --out /tmp/f64.npz

A winter start (Jan 1) is used so the run crosses the snow-layer
creation regime (snl 0 -> 3 around step ~250 with the synthetic
forcing) — the part of the model most sensitive to precision.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncol", type=int, default=4)
    ap.add_argument("--steps", type=int, default=720)
    ap.add_argument("--window", type=int, default=240)
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/elmtpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import numpy as np

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from elmkernels_tpu.driver.model import Model
        from elmkernels_tpu.utils.dates import Date
        model = Model(ncol=args.ncol)

    diags = model.run_windows(Date.from_ymd(1985, 1, 1), args.steps,
                              window=args.window)
    out = {f"state_{k}": np.asarray(v)
           for k, v in zip(model.state._fields, model.state)}
    out.update({f"diag_{k}": np.asarray(v)
                for k, v in zip(diags._fields, diags)})
    np.savez(args.out, **out)
    print(f"wrote {args.out}: t_grnd_mean="
          f"{out['state_t_grnd'].mean():.4f} "
          f"h2osno_max={out['state_h2osno'].max():.4f} "
          f"snl_max={out['state_snl'].max()}")


if __name__ == "__main__":
    main()
