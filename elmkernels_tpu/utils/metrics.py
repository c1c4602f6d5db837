"""Structured per-step metrics logging.

The reference's observability is ``std::cout`` of conservation errors and
prognostics (``conserved_quantity_kokkos.cc:72-80``, ``kokkos_driver.cc:
59-81``).  Here the same quantities are emitted as one JSON line per step
(machine-readable; cheap to tail), with domain reductions computed on
device before the host pull.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

_FLUX_FIELDS = ("eflx_sh_tot", "eflx_lh_tot", "fsa", "t_ref2m")
_ERR_FIELDS = ("errh2o", "errh2o_led", "errh2osno", "errh2osno_steady",
               "errsol", "errlon", "errseb")


class MetricsLogger:
    """Append-mode JSONL writer of step diagnostics summaries."""

    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", buffering=1)

    def log_step(self, date, state, diags) -> dict:
        rec = {"date": f"{date.year:04d}-{date.doy:03d}", "sec": date.sec}
        for k in _ERR_FIELDS:
            rec[k + "_max"] = float(np.max(np.abs(np.asarray(
                getattr(diags, k)))))
        for k in _FLUX_FIELDS:
            rec[k + "_mean"] = float(np.mean(np.asarray(getattr(diags, k))))
        rec["niters_canopy_max"] = int(np.max(np.asarray(
            diags.niters_canopy)))
        rec["h2osno_mean"] = float(np.mean(np.asarray(state.h2osno)))
        rec["t_grnd_mean"] = float(np.mean(np.asarray(state.t_grnd)))
        self._fh.write(json.dumps(rec) + "\n")
        return rec

    def log_window(self, date, state, diags) -> dict:
        """One JSONL record per ``run_windows`` window: diags is the
        window-reduced :class:`ScanDiagnostics` ([nsteps_window] arrays
        of on-device reductions); errors record the window max, fluxes
        the window mean — the production long-run observability."""
        import time
        rec = {"ts": round(time.time(), 3),
               "date": f"{date.year:04d}-{date.doy:03d}", "sec": date.sec,
               "window": len(np.asarray(diags.errsol_max))}
        for k in _ERR_FIELDS:
            rec[k + "_max"] = float(np.max(np.abs(np.asarray(
                getattr(diags, k + "_max")))))
        for k, sd in (("eflx_sh_tot", "eflx_sh_mean"),
                      ("eflx_lh_tot", "eflx_lh_mean"),
                      ("fsa", "fsa_mean"), ("t_ref2m", "t_ref2m_mean")):
            rec[k + "_mean"] = float(np.mean(np.asarray(getattr(diags,
                                                                sd))))
        rec["niters_canopy_max"] = int(np.max(np.asarray(
            diags.niters_canopy_max)))
        rec["h2osno_mean"] = float(np.mean(np.asarray(state.h2osno)))
        rec["t_grnd_mean"] = float(np.mean(np.asarray(state.t_grnd)))
        self._fh.write(json.dumps(rec) + "\n")
        return rec

    def close(self):
        self._fh.close()
