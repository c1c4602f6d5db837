"""Multi-host (multi-process) distributed execution test.

The reference's inter-node parallelism is an MPI rank-block domain
decomposition with per-rank forcing reads and MPI_Reduce diagnostics
(SURVEY.md §2e) — but it is never tested with nprocs > 1 there.  Here two
OS processes run `jax.distributed` over CPU (2 virtual devices each, so
the global 'col' mesh spans 4 devices / 2 processes), each building only
its own column block, assembled with
``jax.make_array_from_process_local_data``.
"""

import os
import socket
import subprocess
import sys

import pytest
import pathlib

WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_step():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, f"proc {pid} output:\n{out}"


@pytest.mark.slow
def test_four_process_uneven_series_ingest(tmp_path):
    """4 processes x 2 devices with ncol NOT divisible by the 8-device
    mesh (VERDICT r4 item 9): 21 real columns pad to ceil-rule blocks
    of 3 (6/6/6/3+pad — the XLA-native handling of uneven remainders,
    utils/domain.column_blocks), offset 2 cells into a (lat=7, lon=4)
    grid so every rank's hyperslab starts/ends mid-row (the
    read_input.cc:52-87 partial-row case).  Each real shard must be
    bit-close to the single-process oracle; pad columns are inert."""
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from make_forcing_files import write_months
    base = str(tmp_path / "forc_")
    write_months(base, 1985, 7, 2, 7, 4)  # (lat=7, lon=4) = 28 cells

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(MH_NCOL="21", MH_NLON="4", MH_COL0="2")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "4", str(pid),
             f"series:{base}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, f"proc {pid} output:\n{out}"


@pytest.mark.slow
def test_two_process_series_ingest_from_shared_files(tmp_path):
    """Production series ingest across 2 processes from a SHARED
    month-file forcing (VERDICT r3 item 8): per-host hyperslab reads,
    globalized series payload, 8 scan-series steps over the 2-process
    mesh, each shard bit-identical to the single-process run."""
    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    from make_forcing_files import write_months
    base = str(tmp_path / "forc_")
    write_months(base, 1985, 7, 2, 4, 2)  # (lat=4, lon=2) = 8 cells

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "2", str(pid),
             f"series:{base}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, f"proc {pid} output:\n{out}"
