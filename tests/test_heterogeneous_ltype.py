"""Per-column landunit type: mixed soil/ice-sheet/wetland batches.

The reference carries ONE ``LandType`` per domain (``land_data.h:5-44``)
— a placeholder it never generalizes.  Here ``ltype`` may be an [ncol]
array: every landunit branch goes through ``constants.ltype_mask`` /
``lsel``, folding to the zero-cost static branch for int ltype and to
per-column masked selects for arrays.  Non-soil columns cold-start
through the reference's init kernels (ice-filled at 250 K / water-filled
wetland) instead of the hardwired soil IC.

Contract: (a) a mixed batch conserves water/energy per column, (b) each
column tracks the homogeneous run of its own land class, (c) the static
path is untouched (asserted implicitly by the golden suite).
"""

import numpy as np
import pytest

from elmkernels_tpu import constants as c
from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date

LTYPES = [c.ISTSOIL, c.ISTICE, c.ISTWET, c.ISTCROP]
VTYPES = [12, 0, 0, 19]  # ice/wet are unvegetated
NSTEP = 48


def test_ltype_mask_and_lsel_fold_statics():
    land = c.LandType(ltype=c.ISTSOIL)
    assert c.ltype_mask(land, c.ISTSOIL, c.ISTCROP) is True
    assert c.ltype_mask(land, c.ISTICE) is False
    assert c.lsel(True, 1.0, 2.0) == 1.0 and c.lsel(False, 1.0, 2.0) == 2.0
    import jax.numpy as jnp
    landh = c.LandType(ltype=jnp.array([c.ISTSOIL, c.ISTICE]))
    m = c.ltype_mask(landh, c.ISTICE, c.ISTICE_MEC)
    np.testing.assert_array_equal(np.asarray(m), [False, True])
    # per-column select broadcasts over trailing axes
    a = jnp.ones((2, 3))
    out = c.lsel(m, a, 0.0 * a)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[0, 0, 0], [1, 1, 1]])


@pytest.fixture(scope="module")
def mixed():
    m = Model(ncol=len(LTYPES), ltype=np.array(LTYPES), vtype=VTYPES,
              lat_deg=65.0, lon_deg=250.0)
    d = m.run_scan(Date.from_ymd(1985, 1, 1), NSTEP)
    return m, d


def test_mixed_ltype_batch_conserves_per_column(mixed):
    m, d = mixed
    # water: per-column balance stays bounded by the exchange-flux
    # openness, snow balance and radiation closures stay tight
    assert float(np.abs(np.asarray(d.errh2o_max)).max()) < 0.1
    assert float(np.abs(np.asarray(d.errh2osno_max)).max()) < 1e-7
    assert float(np.abs(np.asarray(d.errsol_max)).max()) < 1e-5
    assert float(np.abs(np.asarray(d.errlon_max)).max()) < 1e-8
    # energy: bounded by the reference's tinc linearization (test_driver)
    assert float(np.abs(np.asarray(d.errseb_max)).max()) < 300.0
    t = np.asarray(m.state.t_soisno)
    assert np.all(np.isfinite(t[t != 0.0]))
    # the land classes actually behaved differently
    tg = np.asarray(m.state.t_grnd)
    assert abs(tg[0] - tg[1]) > 1.0   # soil vs ice sheet
    # ice column stays an ice sheet: frozen profile near 250 K init
    assert tg[1] < tg[0]


@pytest.mark.slow
def test_mixed_ltype_columns_match_homogeneous_runs(mixed):
    m, _ = mixed
    mixed_state = {k: np.asarray(v) for k, v in m.state._asdict().items()}
    for i, (lt, vt) in enumerate(zip(LTYPES, VTYPES)):
        homo = Model(ncol=1, ltype=int(lt), vtype=vt, lat_deg=65.0,
                     lon_deg=250.0)
        homo.run_scan(Date.from_ymd(1985, 1, 1), NSTEP)
        for name, hv in homo.state._asdict().items():
            np.testing.assert_allclose(
                mixed_state[name][i:i + 1], np.asarray(hv),
                rtol=1e-6, atol=1e-8,
                err_msg=f"state.{name} ltype={lt} (col {i})")
