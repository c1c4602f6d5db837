"""lax.scan multi-step driver must match the step-by-step host loop
bit-for-bit (same traced ops, same order)."""

import jax
import numpy as np

from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date


def test_scan_matches_loop():
    start = Date.from_ymd(1985, 7, 1, 6 * 3600)
    nsteps = 4

    m_loop = Model(ncol=3)
    m_scan = Model(ncol=3)

    last = m_loop.run(start, nsteps)
    diags = m_scan.run_scan(start, nsteps)

    # final state agrees to fusion-reassociation noise (XLA fuses the
    # scan body slightly differently than the standalone step: measured
    # max rel diff ~5e-14 over 4 steps)
    mism = []
    for name, a in zip(m_loop.state._fields, m_loop.state):
        b = getattr(m_scan.state, name)
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind != "f":
            if not np.array_equal(a, b):
                mism.append(name)
            continue
        if not np.allclose(a, b, rtol=1e-11, atol=1e-16, equal_nan=True):
            mism.append(name)
    assert not mism, f"state fields differ after scan: {mism}"

    # reduced diagnostics of the last step agree with the loop's full ones
    assert diags.errsol_max.shape == (nsteps,)
    np.testing.assert_allclose(
        float(diags.errsol_max[-1]),
        float(np.abs(np.asarray(last.errsol)).max()), rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        float(diags.eflx_sh_mean[-1]),
        float(np.asarray(last.eflx_sh_tot).mean()), rtol=1e-10)


def test_scan_jit_cache_is_shared():
    # second model with same shapes/config reuses the compiled scan
    from elmkernels_tpu.driver.model import _jitted_scan
    before = _jitted_scan._cache_size()
    m = Model(ncol=3)
    m.run_scan(Date.from_ymd(1985, 7, 1, 6 * 3600), 4)
    assert _jitted_scan._cache_size() == before


def test_run_windows_matches_run_scan():
    # double-buffered windowed ingest must reproduce the monolithic scan
    # bit-for-bit: same executable (window == scan length per chunk),
    # same forcing values, only the ingest pipeline differs.
    start = Date.from_ymd(1985, 7, 1, 6 * 3600)

    m_scan = Model(ncol=3)
    m_win = Model(ncol=3)

    d_scan = m_scan.run_scan(start, 2)
    d_scan2 = m_scan.run_scan(Date.from_ymd(1985, 7, 1, 6 * 3600 + 3600), 2)

    seen = []
    d_win = m_win.run_windows(start, 4, window=2,
                              callback=lambda d, s, x: seen.append(d))

    for name, a in zip(m_scan.state._fields, m_scan.state):
        b = getattr(m_win.state, name)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(d_win.errsol_max),
        np.concatenate([np.asarray(d_scan.errsol_max),
                        np.asarray(d_scan2.errsol_max)]))
    assert len(seen) == 2  # one callback per window
    assert seen[1].sec == 6 * 3600 + 4 * 1800


def test_run_windows_rejects_ragged():
    m = Model(ncol=2)
    try:
        m.run_windows(Date.from_ymd(1985, 7, 1), 5, window=2)
    except ValueError:
        pass
    else:
        raise AssertionError("ragged window accepted")


def test_series_ingest_matches_stacked():
    """The forcing-series ingest layout (raw forcing-grid samples +
    per-step bracket indices, gathers on device) must reproduce the
    per-step-stacked scan bit-for-bit — it ships the same sample values,
    just ~dtf/dt-fold fewer of them (BASELINE.md r3 ingest section)."""
    start = Date.from_ymd(1985, 7, 1, 6 * 3600)
    m_stack = Model(ncol=3)
    m_series = Model(ncol=3)
    d_stack = m_stack.run_scan(start, 6)
    d_series = m_series.run_scan_series(start, 6)
    for name, a in zip(m_stack.state._fields, m_stack.state):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(getattr(m_series.state, name)),
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(d_stack.errsol_max),
                                  np.asarray(d_series.errsol_max))


def test_run_windows_series_matches_stacked():
    start = Date.from_ymd(1985, 7, 1, 6 * 3600)
    m_a = Model(ncol=3)
    m_b = Model(ncol=3)
    d_a = m_a.run_windows(start, 4, window=2)
    d_b = m_b.run_windows(start, 4, window=2, series=True)
    for name, a in zip(m_a.state._fields, m_a.state):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(getattr(m_b.state, name)),
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(d_a.errsol_max),
                                  np.asarray(d_b.errsol_max))


def test_series_ingest_across_phenology_rollover():
    """A window crossing the monthly-phenology bracket switch (mid-month)
    exercises the 2-unique-pair phen series path; still bit-identical."""
    start = Date.from_ymd(1985, 1, 15)
    m_stack = Model(ncol=2)
    m_series = Model(ncol=2)
    m_stack.run_scan(start, 48)
    m_series.run_scan_series(start, 48)
    for name, a in zip(m_stack.state._fields, m_stack.state):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(getattr(m_series.state, name)),
            err_msg=name)
