"""Config system, step guard (failure detection + rollback), and metrics
logger — the aux subsystems the reference lacks (SURVEY.md §5)."""

import json

import numpy as np
import pytest

from elmkernels_tpu.config import RunConfig
from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date
from elmkernels_tpu.utils.guard import StepGuard
from elmkernels_tpu.utils.metrics import MetricsLogger


def test_config_roundtrip(tmp_path):
    cfg = RunConfig(ncol=7, nsteps=3, lat_deg=40.0, errh2o_max=0.5)
    p = tmp_path / "run.json"
    cfg.save(p)
    cfg2 = RunConfig.from_file(p)
    assert cfg2 == cfg


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"ncol": 2, "notaknob": 1}))
    with pytest.raises(ValueError, match="notaknob"):
        RunConfig.from_file(p)


def test_config_cli_overrides(tmp_path):
    p = tmp_path / "run.json"
    RunConfig(ncol=3).save(p)
    cfg = RunConfig.from_cli(["--config", str(p), "--nsteps", "9",
                              "--lat_deg", "12.5"])
    assert cfg.ncol == 3 and cfg.nsteps == 9 and cfg.lat_deg == 12.5


def test_guard_passes_and_rolls_back(tmp_path):
    model = Model(ncol=2)
    date = Date.from_ymd(1985, 7, 1)
    guard = StepGuard(errh2o_max=1.0, errsol_max=1e-6)
    guard.snapshot(model.state)
    diags = model.advance(date)
    rep = guard.check(model.state, diags)
    assert rep.ok and not guard.failures

    # impossible bound -> failure + rollback to the validated snapshot
    strict = StepGuard(errh2o_max=0.0)
    strict.snapshot(model.state)
    t_before = np.array(model.state.t_grnd)
    date.increment_seconds(1800)
    diags = model.advance(date)
    rep = strict.check(model.state, diags)
    assert not rep.ok and strict.failures
    assert any("errh2o" in r for r in rep.reasons)
    restored = strict.restore_into(model.state)
    np.testing.assert_array_equal(np.asarray(restored.t_grnd), t_before)


def test_metrics_logger(tmp_path):
    model = Model(ncol=2)
    date = Date.from_ymd(1985, 7, 1)
    mpath = tmp_path / "metrics.jsonl"
    log = MetricsLogger(mpath)
    diags = model.advance(date)
    rec = log.log_step(date, model.state, diags)
    log.close()
    lines = mpath.read_text().strip().splitlines()
    assert len(lines) == 1
    got = json.loads(lines[0])
    assert got == pytest.approx(rec) or got.keys() == rec.keys()
    assert np.isfinite(got["errh2o_max"])
    assert got["errsol_max"] < 1e-6


def test_config_driven_model():
    cfg = RunConfig(ncol=3, vtype=12, lat_deg=40.0)
    model = cfg.make_model()
    assert model.ncol == 3
    diags = model.advance(cfg.start_date())
    assert np.all(np.isfinite(np.asarray(diags.errh2o)))


def test_errsol_bound_scaling_law():
    """The batch-scaled shortwave contract (VERDICT r3 item 9): pinned
    calibration points so a formula change that would mask a scale
    regression fails here."""
    from elmkernels_tpu.utils.guard import errsol_bound
    assert errsol_bound(8192) == pytest.approx(2.5e-5)
    assert errsol_bound(128) == pytest.approx(2.5e-5)  # no shrink below
    # covers every measured point (5e-7 @8192 NH-July, 1.5e-5 @262k
    # hetero July, 1.9e-5 @128 southern-summer January) with margin,
    # while a real f32-radiation regression (1e-4+) fails at any size
    b262k = errsol_bound(262144)
    assert 1.9e-5 < b262k < 5.0e-5
    b1m = errsol_bound(1048576)
    assert b262k < b1m < 6.0e-5
    # horizon term (r5): a guarded long run draws the window max every
    # window, so the bound grows ~sqrt(log total-samples); the r5
    # 80-day 262k integration's running max (3.8e-5, rising seasonally)
    # must sit inside the half-year bound while a real regression
    # (1e-4) stays outside at any horizon
    b_halfyear = errsol_bound(262144, nsteps=181 * 48)
    assert b262k < b_halfyear < 8.0e-5
    assert 3.8e-5 < b_halfyear
    assert errsol_bound(262144, nsteps=17520) < 1e-4  # full year
    assert errsol_bound(262144, nsteps=48) == pytest.approx(b262k)


def test_guard_batch_scaled_bound_and_scan_diags():
    """StepGuard(ncol=...) adopts the batch-scaled errsol bound and
    validates window-reduced ScanDiagnostics (the production long-run
    loop guards per run_windows window)."""
    from elmkernels_tpu.utils.guard import errsol_bound
    model = Model(ncol=4)
    g = StepGuard(ncol=262144)
    assert g.errsol_max == pytest.approx(errsol_bound(262144))
    assert StepGuard(ncol=262144, errsol_max=3e-3).errsol_max == 3e-3

    guard = StepGuard(ncol=4)
    guard.snapshot(model.state)
    diags = model.run_scan(Date.from_ymd(1985, 7, 1), 4)  # ScanDiagnostics
    rep = guard.check(model.state, diags)
    assert rep.ok, rep.reasons

    strict = StepGuard(ncol=4, errh2o_led_max=0.0)
    strict.snapshot(model.state)
    rep = strict.check(model.state, diags)
    assert not rep.ok and any("errh2o_led" in r for r in rep.reasons)
