"""Mixed-precision radiation (f32 SNICAR + two-stream inside the f64
step) is the production default; it must track the reference-exact
pure-f64 trajectory closely and keep the non-radiative conservation
closures exact.  ``mixed_radiation=False`` is the pure-f64 opt-out."""

import numpy as np

from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date


def test_mixed_radiation_tracks_f64():
    start = Date.from_ymd(1985, 1, 1)
    base = dict(ncol=3, mixed_canopy=False, warm_start=False)  # isolate
    m_ref = Model(mixed_radiation=False, **base)
    m_mix = Model(**base)  # mixed radiation (the promoted default)
    d_ref = m_ref.run_scan(start, 96)
    d_mix = m_mix.run_scan(start, 96)

    # the pure-f64 opt-out keeps the reference-exact shortwave closure
    assert float(np.abs(np.asarray(d_ref.errsol_max)).max()) < 1e-8
    # water ledger stays exact (radiation does not move water)
    assert float(np.abs(np.asarray(d_mix.errh2o_led_max)).max()) < 1e-9
    # shortwave closure degrades only to f32 roundoff
    assert float(np.abs(np.asarray(d_mix.errsol_max)).max()) < 1e-4
    # state drift after 2 days is far below physical signal
    for name in ("t_grnd", "t_veg", "t_soisno", "h2osno", "h2ocan"):
        a = np.asarray(getattr(m_ref.state, name))
        b = np.asarray(getattr(m_mix.state, name))
        assert np.max(np.abs(a - b)) < 0.05, name
    # absorbed solar tracks
    np.testing.assert_allclose(np.asarray(d_mix.fsa_mean),
                               np.asarray(d_ref.fsa_mean),
                               rtol=1e-4, atol=1e-3)
