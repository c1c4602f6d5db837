"""Per-column vegetation heterogeneity: a mixed-PFT batch must evolve
each column exactly like a homogeneous run of that column's PFT.

The reference extracts per-cell traits (``pft_data_impl.hh:60-116``,
``initialize_elm_kokkos.cc:374-431``); here the traits are [ncol] gathers
of the clm_params trait matrix and the photosynthesis pathway compiles
"mixed" (both C3 and C4 branches, selected per column).  The homogeneous
runs compile the pure pathway, so agreement also validates that the mixed
compilation preserves the per-column iteration sequences.
"""

import numpy as np
import pytest

from elmkernels_tpu.data import params as params_mod
from elmkernels_tpu.driver.model import DEFAULT_PFT_PATH, Model
from elmkernels_tpu.utils.dates import Date

# NET temperate (C3 tree), arctic C3 grass, C4 grass, soybean (btran boost)
PFTS = [1, 12, 14, 23]
NSTEP = 24  # half a day: crosses night -> day under synthetic forcing


def _run(vtype, ncol, nsteps=NSTEP):
    # the batch-vs-homogeneous equivalence isolates the per-column PFT
    # plumbing, so the f32 canopy modes are pinned OFF: the pure-vs-
    # mixed-pathway compile ulps are f32-sized under the promoted
    # default (mixed_canopy) and crossing a freeze threshold amplifies
    # them past the f64-ulp-calibrated tolerance below
    m = Model(ncol=ncol, vtype=vtype, mixed_canopy=False,
              warm_start=False)
    # run_scan is bit-identical to the per-step loop
    # (test_scan_driver.test_scan_matches_loop) and ~10x cheaper on the
    # CPU suite (one dispatch per run instead of per step)
    m.run_scan(Date(1985, 1, 1), nsteps)
    return m


def test_pft_table_gather_matches_single_loads():
    table = params_mod.load_pft_table(DEFAULT_PFT_PATH)
    vt = np.array(PFTS, np.int32)
    psn = params_mod.gather_pft_psn(table, vt)
    alb = params_mod.gather_pft_alb(table, vt)
    for i, v in enumerate(PFTS):
        single = params_mod.load_pft_psn(DEFAULT_PFT_PATH, v)
        for name in psn._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(psn, name))[i], getattr(single, name),
                rtol=0, atol=0, err_msg=f"psn.{name} pft={v}")
        salb = params_mod.load_pft_alb(DEFAULT_PFT_PATH, v)
        for name in ("rhol", "rhos", "taul", "taus"):
            np.testing.assert_allclose(
                np.asarray(getattr(alb, name))[i],
                np.asarray(getattr(salb, name)), err_msg=f"alb.{name}")
        np.testing.assert_allclose(np.asarray(alb.xl)[i], salb.xl)


def test_psn_mode_detection():
    from elmkernels_tpu.physics.photosynthesis import psn_mode_of
    table = params_mod.load_pft_table(DEFAULT_PFT_PATH)
    assert psn_mode_of(params_mod.load_pft_psn(DEFAULT_PFT_PATH, 12)) == "c3"
    assert psn_mode_of(params_mod.load_pft_psn(DEFAULT_PFT_PATH, 14)) == "c4"
    assert psn_mode_of(params_mod.gather_pft_psn(
        table, np.array(PFTS))) == "mixed"


@pytest.mark.slow
def test_mixed_batch_matches_homogeneous_runs():
    """Columns of a 4-PFT mixed batch track per-PFT homogeneous runs."""
    mixed = _run(PFTS, ncol=len(PFTS))
    mixed_state = {k: np.asarray(v) for k, v in
                   mixed.state._asdict().items()}

    for i, v in enumerate(PFTS):
        homo = _run(v, ncol=1)
        for name, hv in homo.state._asdict().items():
            hv = np.asarray(hv)
            mv = mixed_state[name][i:i + 1]
            # pure vs mixed compiles differ by ulps inside iterative
            # solvers; prognostics must still agree far tighter than any
            # physical signal (t in K, water in kg/m2)
            np.testing.assert_allclose(
                mv, hv, rtol=1e-6, atol=1e-8,
                err_msg=f"state.{name} pft={v} (col {i})")


def test_noveg_column_in_batch():
    """A NOVEG (bare ground) column inside a heterogeneous batch must
    follow the bareground pathway per column — no trace-static vtype
    branch may broadcast a vegetated column's physics onto it — and
    match its homogeneous run (VERDICT r2 item 9)."""
    pfts = [0, 12]  # NOVEG + arctic C3 grass
    mixed = _run(pfts, ncol=2)
    assert np.all(np.asarray(mixed.params.rootfr)[0] == 0.0)
    assert np.any(np.asarray(mixed.params.rootfr)[1] > 0.0)
    for i, v in enumerate(pfts):
        homo = _run(v, ncol=1)
        for name, hv in homo.state._asdict().items():
            np.testing.assert_allclose(
                np.asarray(getattr(mixed.state, name))[i:i + 1],
                np.asarray(hv), rtol=1e-6, atol=1e-8,
                err_msg=f"state.{name} pft={v} (col {i})")


def test_mixed_batch_conserves():
    m = Model(ncol=len(PFTS), vtype=PFTS)
    date = Date(1985, 1, 1)
    errsol, errseb, errh2o = [], [], []
    for _ in range(8):
        d = m.advance(date)
        date.increment_seconds(int(m.dtime))
        errsol.append(np.abs(np.asarray(d.errsol)).max())
        errseb.append(np.abs(np.asarray(d.errseb)).max())
        errh2o.append(np.abs(np.asarray(d.errh2o)).max())
    # default model runs mixed radiation: errsol carries f32 roundoff
    assert max(errsol) < 1e-5
    # errseb carries the reference's tinc linearization of outgoing
    # longwave (~4*emg*sigma*T0^3*tinc); bound as in test_driver
    assert max(errseb) < 300.0
    assert max(errh2o) < 0.1
