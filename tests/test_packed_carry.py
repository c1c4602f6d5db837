"""packed_carry=True (dtype-fused scan carry) must be bit-identical to
the default per-leaf carry over these horizons: packing is
reshape+concat / slice+reshape only, no arithmetic (utils/packing.py;
r5 roofline's named lever).  At season scale a last-ulp
fusion-contraction difference can appear in one carried flux (verified
700-step winter drive, documented in utils/packing.py) — these tests
pin the short-horizon exactness contract on both scan layouts."""

import numpy as np

from elmkernels_tpu.data.state import cold_start
from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.utils.dates import Date
from elmkernels_tpu.utils.packing import pack_tree, unpack_tree


def test_pack_unpack_roundtrip():
    st = cold_start(5)
    bufs = pack_tree(st)
    # one f64 buffer + one i32 buffer (snl)
    assert len(bufs) == 2
    back = unpack_tree(bufs, [(a.shape, a.dtype) for a in st], type(st))
    for name, a, b in zip(st._fields, st, back):
        assert np.asarray(a).dtype == np.asarray(b).dtype, name
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def _assert_states_equal(sa, sb, ctx):
    mism = [n for n, a, b in zip(sa._fields, sa, sb)
            if not np.array_equal(np.asarray(a), np.asarray(b))]
    assert not mism, f"{ctx}: fields differ: {mism}"


def test_scan_packed_bit_identical():
    # winter at a high-latitude site so the snow pack (snl, i32) and the
    # full layer machinery are live in the carry
    start = Date.from_ymd(1985, 1, 1)
    a = Model(ncol=4)
    b = Model(ncol=4, packed_carry=True)
    da = a.run_scan(start, 6)
    db = b.run_scan(start, 6)
    _assert_states_equal(a.state, b.state, "run_scan")
    # the reduced diagnostics' abs-max fuses with the pack/unpack and may
    # reassociate the ledger sum (observed 1e-19 absolute); the STATE
    # comparison above is the bit-exactness contract
    np.testing.assert_allclose(np.asarray(da.errh2o_led_max),
                               np.asarray(db.errh2o_led_max),
                               rtol=0, atol=1e-15)


def test_scan_series_packed_bit_identical():
    start = Date.from_ymd(1985, 7, 1, 6 * 3600)
    a = Model(ncol=4)
    b = Model(ncol=4, packed_carry=True)
    a.run_scan_series(start, 6)
    b.run_scan_series(start, 6)
    _assert_states_equal(a.state, b.state, "run_scan_series")
