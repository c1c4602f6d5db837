"""Tests for infrastructure: checkpoint/restore, domain decomposition,
reductions, calendar, and sharded state placement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from elmkernels_tpu.data.state import cold_start
from elmkernels_tpu.parallel import column_mesh, shard_state
from elmkernels_tpu.parallel.reductions import min_max_sum
from elmkernels_tpu.utils import checkpoint, domain
from elmkernels_tpu.utils.dates import (Date, Ticker, month_indices,
                                        monthly_data_weights)


def test_checkpoint_roundtrip(tmp_path):
    state = cold_start(8)
    state = state._replace(h2osno=jnp.arange(8.0))
    checkpoint.save(str(tmp_path / "ckpt"), state)
    restored = checkpoint.restore(str(tmp_path / "ckpt"))
    for a, b in zip(state, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_primary_vars_subset():
    pv = checkpoint.primary_vars(cold_start(3))
    assert set(pv) >= {"snl", "h2osno", "t_soisno", "h2osoi_liq", "dz"}


def test_domain_decomposition_partition():
    ng = (7, 9)
    total = 0
    seen = set()
    for r in range(6):
        dd = domain.create_domain_decomposition_2d(ng, 6, r)
        total += dd.ncells
        for i in range(dd.start[0], dd.start[0] + dd.n_local[0]):
            for j in range(dd.start[1], dd.start[1] + dd.n_local[1]):
                seen.add((i, j))
    assert total == 63 and len(seen) == 63


def test_calendar_roundtrip():
    d = Date.from_ymd(1985, 2, 27, 23 * 3600)
    d.increment_seconds(2 * 3600)
    assert d.date() == (1985, 2, 28)
    d.increment_day(1)
    assert d.date() == (1985, 3, 1)  # no-leap calendar
    t = Ticker(Date.from_ymd(1985, 1, 1), 48)
    for _ in range(49):
        t.advance()
    assert t.days == 1 and t.ticks == 1
    m1, m2 = month_indices(Date.from_ymd(1985, 1, 10))
    assert (m1, m2) == (11, 0)
    wt1, wt2 = monthly_data_weights(Date.from_ymd(1985, 1, 16, 43200))
    assert abs(wt1 + wt2 - 1.0) < 1e-12


def test_sharded_state_and_reductions():
    mesh = column_mesh()
    ndev = len(jax.devices())
    state = cold_start(ndev * 2)
    sharded = shard_state(mesh, state)
    assert "col" in str(sharded.t_grnd.sharding.spec)
    mms = min_max_sum(sharded.t_grnd)
    assert np.isclose(float(mms.sum),
                      float(np.sum(np.asarray(state.t_grnd))))
