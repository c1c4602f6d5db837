#!/usr/bin/env python3
"""Attribute the canopy stability+psn group's cold-compile cost
(VERDICT r2..r4: ~78 s on the TPU backend, flat across rounds).

Captures the REAL arguments of ``canopy_fluxes.stability_iteration``
and ``photosynthesis.photosynthesis`` by monkeypatch during one eager
step, then cold-compiles three probes (fresh in-process cache):

  psn        photosynthesis alone (both inner while_loops:
             secant + Brent)
  psn-nobrent  photosynthesis with the Brent-fallback loop disabled
             (secant only) — bounds what the second nested loop costs
  canopy     the full stability_iteration (outer while_loop with the
             psn call inside)

  CANOPY_PROBE_PLATFORM=cpu|tpu  backend (default: session default)
  CANOPY_PROBE_NCOL              batch (default 256; compile time is
                                 nearly shape-independent — this is an
                                 attribution tool, not a benchmark)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("CANOPY_PROBE_PLATFORM"):
    jax.config.update("jax_platforms",
                      os.environ["CANOPY_PROBE_PLATFORM"])
jax.config.update("jax_enable_x64", True)


def main():
    import jax.numpy as jnp
    import numpy as np

    from elmkernels_tpu.driver import step as step_mod
    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.physics import canopy_fluxes as cfx
    from elmkernels_tpu.physics import photosynthesis as psn
    from elmkernels_tpu.utils.dates import Date

    ncol = int(os.environ.get("CANOPY_PROBE_NCOL", "256"))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = Model(ncol=ncol, lat_deg=40.0, lon_deg=255.0)
        date = Date.from_ymd(1985, 7, 1, 18 * 3600)  # daytime: psn active
        forc = jax.tree.map(jnp.asarray,
                            model.forcing.window(date, model.dtime))
        phen = jax.tree.map(jnp.asarray, model.phenology.window(date))

    captured = {}
    orig_stab = cfx.stability_iteration
    orig_psn = psn.photosynthesis
    # the eager capture step must run on the HOST CPU: eagerly stepping
    # on a remote-tunnel accelerator round-trips per op
    cap_cpu = jax.devices("cpu")[0]

    def spy_stab(*a, **kw):
        captured.setdefault("stab", (a, kw))
        return orig_stab(*a, **kw)

    def spy_psn(*a, **kw):
        # called INSIDE the stability while_loop, so args are tracers:
        # record shapes/dtypes only (values don't affect compile time)
        def shp(x):
            return ((x.shape, x.dtype)
                    if hasattr(x, "shape") and hasattr(x, "dtype") else x)
        captured.setdefault("psn", (jax.tree.map(shp, a, is_leaf=lambda
                                                 x: not isinstance(
                                                     x, (tuple, list))),
                                    {k: shp(v) for k, v in kw.items()}))
        return orig_psn(*a, **kw)

    cfx.stability_iteration = spy_stab
    psn.photosynthesis = spy_psn
    try:  # ONE EAGER step on host CPU: concrete arrays land in `captured`
        with jax.default_device(cap_cpu):
            step_mod.advance(model.land, model.psnveg, model.albveg,
                             model.snicar, model.params, model.state,
                             forc, phen, model.dtime,
                             psn_mode=model.psn_mode)
    finally:
        cfx.stability_iteration = orig_stab
        psn.photosynthesis = orig_psn
    assert "stab" in captured and "psn" in captured

    def concrete(x):
        if isinstance(x, tuple) and len(x) == 2 and hasattr(x[1], "kind"):
            shape, dtype = x
            return (jnp.ones(shape, dtype) if np.dtype(dtype).kind == "f"
                    else jnp.ones(shape, dtype))
        return jnp.asarray(np.asarray(x)) if isinstance(x, jax.Array) \
            else x

    is_leaf = (lambda x: isinstance(x, jax.Array)
               or (isinstance(x, tuple) and len(x) == 2
                   and hasattr(x[1], "kind")))
    sa, skw = jax.tree.map(concrete, captured["stab"], is_leaf=is_leaf)
    pa = jax.tree.map(concrete, captured["psn"][0], is_leaf=is_leaf)
    pkw = {k: concrete(v) for k, v in captured["psn"][1].items()}

    def probe(name, thunk):
        jax.clear_caches()
        t0 = time.time()
        lowered = jax.jit(thunk).lower()
        t_lower = time.time() - t0
        hlo_lines = len(lowered.as_text().splitlines())
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        print(f"{name:12s} lower {t_lower:6.1f}s  compile {t_compile:6.1f}s"
              f"  stablehlo {hlo_lines:6d} lines", flush=True)
        return t_compile

    print(f"# backend={jax.default_backend()} ncol={ncol}")
    t_psn = probe("psn", lambda: orig_psn(*pa, **pkw))
    t_can = probe("canopy", lambda: orig_stab(*sa, **skw))
    print(f"# attribution: psn alone {t_psn:.1f}s of canopy {t_can:.1f}s "
          f"({100 * t_psn / max(t_can, 1e-9):.0f}%; the remainder is the "
          f"outer Newton loop's flux chains + XLA passes over the "
          f"composed graph)")


if __name__ == "__main__":
    main()
