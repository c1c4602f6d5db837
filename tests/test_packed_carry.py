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


def test_packed_sharded_scan_col_sharding():
    """On an 8-device column mesh the packed carry must (a) match the
    UNPACKED run under the same GSPMD partitioning bit-for-bit (the
    packing contract, isolated from partitioning's own last-ulp fusion
    noise vs a single-device run) and (b) leave every output leaf
    'col'-sharded — the dtype-fused [ncol, K] buffers concatenate along
    the NON-column axis, so the shard layout must survive the scan."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from elmkernels_tpu.driver.model import _jitted_scan_series
    from elmkernels_tpu.parallel import mesh as pmesh

    ncol, nsteps = 16, 3
    start = Date.from_ymd(1985, 7, 1, 12 * 3600)
    m = Model(ncol=ncol, lat_deg=40.0, lon_deg=0.0)
    payload_host = m._host_series(start, nsteps)
    mesh = pmesh.column_mesh(jax.devices()[:8])
    params = pmesh.shard_params(mesh, m.params, ncol)

    def payload_spec(x):
        shp = np.shape(x)
        if shp and shp[-1] == ncol:
            return NamedSharding(mesh,
                                 P(*([None] * (len(shp) - 1)), "col"))
        return NamedSharding(mesh, P())
    ser, steps, (phen_uniq, phen_steps), aero = jax.device_put(
        payload_host, jax.tree.map(payload_spec, payload_host))

    out = {}
    for packed in (False, True):
        state = pmesh.shard_state(mesh, m.state)  # fresh (donated)
        new_state, _ = _jitted_scan_series(
            m.land, m.dtime, m.elm_correct_snow_aging, m.psn_mode,
            False, m.mixed_radiation, m.elm_correct_seb, m.warm_start,
            m.het_ltype, m.mixed_canopy, packed, m.snicar, params,
            m.psnveg, m.albveg, state, ser, steps, phen_uniq,
            phen_steps, aero)
        jax.block_until_ready(new_state)
        out[packed] = new_state

    unsharded = [f"{n}:{leaf.sharding.spec}"
                 for n, leaf in zip(out[True]._fields, out[True])
                 if len(leaf.sharding.spec) == 0
                 or leaf.sharding.spec[0] != "col"]
    assert not unsharded, f"leaves lost col sharding: {unsharded}"
    _assert_states_equal(out[False], out[True], "sharded packed scan")


def test_scan_series_packed_bit_identical():
    start = Date.from_ymd(1985, 7, 1, 6 * 3600)
    a = Model(ncol=4)
    b = Model(ncol=4, packed_carry=True)
    a.run_scan_series(start, 6)
    b.run_scan_series(start, 6)
    _assert_states_equal(a.state, b.state, "run_scan_series")
