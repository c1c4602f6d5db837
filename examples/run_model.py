#!/usr/bin/env python3
"""Config-driven model run: the production driver.

Covers the reference's ``kokkos_driver.cc`` main() plus the subsystems it
lacks: file/CLI configuration, per-step validation with PrimaryVars
rollback, JSONL metrics, periodic checkpoints.

Usage:
  python examples/run_model.py --config run.json
  python examples/run_model.py --ncol 8 --nsteps 48 --metrics_path m.jsonl
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main(argv=None):
    # parse before touching jax so --f64 can take effect
    from elmkernels_tpu.config import RunConfig
    cfg = RunConfig.from_cli(argv)
    if cfg.f64:
        jax.config.update("jax_enable_x64", True)
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)

    import numpy as np
    from elmkernels_tpu.utils.guard import StepGuard
    from elmkernels_tpu.utils import checkpoint as ckpt
    from elmkernels_tpu.utils.clock import Clock

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = cfg.make_model()
    date = cfg.start_date()

    # the default errsol guard (1e-5) already covers the mixed-radiation
    # default; a full-f32 run carries f32 roundoff through every closure,
    # so widen further for it
    errsol_max = cfg.errsol_max
    if not cfg.f64 and errsol_max is not None and errsol_max < 1e-4:
        errsol_max = 1e-4
    guard = StepGuard(errh2o_max=cfg.errh2o_max,
                      errh2osno_max=cfg.errh2osno_max,
                      errsol_max=errsol_max)
    guard.snapshot(model.state)
    metrics = None
    if cfg.metrics_path:
        from elmkernels_tpu.utils.metrics import MetricsLogger
        metrics = MetricsLogger(cfg.metrics_path)
    history = None
    if cfg.history_path:
        from elmkernels_tpu.utils.history import HistoryWriter
        history = HistoryWriter(
            cfg.history_path,
            [f.strip() for f in cfg.history_fields.split(",") if f.strip()],
            every=cfg.history_every, ref_date=date.copy())

    clock = Clock()
    for istep in range(cfg.nsteps):
        with clock.time("advance"):
            diags = model.advance(date)
        with clock.time("validate"):
            rep = guard.check(model.state, diags)
            if not rep.ok:
                print(f"step {istep}: VALIDATION FAILED: "
                      f"{'; '.join(rep.reasons)} — rolling back",
                      file=sys.stderr)
                model.state = guard.restore_into(model.state)
        if metrics:
            metrics.log_step(date, model.state, diags)
        if history:
            history.record(date, model.state, diags)
        if (cfg.checkpoint_dir and cfg.checkpoint_every
                and (istep + 1) % cfg.checkpoint_every == 0):
            with clock.time("checkpoint"):
                ckpt.save(f"{cfg.checkpoint_dir}/step{istep + 1:06d}",
                          model.state)
        date.increment_seconds(int(cfg.dtime))

    summ = clock.summary()
    adv = summ.get("advance", {})
    print(f"done: {cfg.nsteps} steps x {cfg.ncol} cols, "
          f"{adv.get('mean_s', 0) * 1e3:.2f} ms/step, "
          f"{len(guard.failures)} validation failures")
    t = np.asarray(model.state.t_grnd)
    print(f"t_grnd[0]={float(t[0]):.3f} K; all finite={np.all(np.isfinite(t))}")
    if metrics:
        metrics.close()
    if history:
        history.close()
        print(f"history: {len(history.written)} file(s), last "
              f"{history.written[-1] if history.written else 'none'}")
    return 0 if not guard.failures else 1


if __name__ == "__main__":
    sys.exit(main())
