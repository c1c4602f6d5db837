"""Failure detection and rollback around the time step.

The reference's only recovery mechanism is the ``PrimaryVars`` snapshot
("primary variables that need to be saved in case of convergence issues",
``/root/reference/src/data/elm_state.h:15-48``) with host-side deep-copy
(``elm_kokkos_interface.cc:324-347``) — the snapshot exists but nothing in
the reference ever validates a step or restores it.  Here the loop is
closed: :class:`StepGuard` snapshots the primary variables, validates the
post-step state (finiteness + conservation-error bounds), and rolls the
state back on failure, reporting what tripped.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from elmkernels_tpu.utils.checkpoint import primary_vars


def errsol_bound(ncol: int, nsteps: int = 48,
                 base: float = 2.5e-5) -> float:
    """Batch- and horizon-scaled shortwave-closure contract bound for
    the production default (mixed radiation: f32 SNICAR/two-stream
    inside the f64 step).

    ``errsol`` reports the *max over ncol columns* of the f32
    radiative-transfer roundoff; a guarded run requires every checked
    window's max below the bound, so over a long run the statistic is
    effectively the max over ``ncol * nsteps`` samples.  The max of N
    roughly-independent roundoff errors grows ~sqrt(log N), hence the
    bound scales in the TOTAL sample count relative to the calibration
    scale (8192 columns x one 48-step window).  Calibration (TPU v5e +
    CPU, BASELINE.md):

    - ncol=8192 homogeneous Utqiagvik July: measured ~5e-7
    - ncol=262144 heterogeneous global grid, July, one 48-step window:
      measured 1.5e-5 (terminator columns at grazing solar zenith);
      bound 4.7e-5 (unchanged from the pre-nsteps form at nsteps=48)
    - ncol=128 global grid, JANUARY (southern-summer peak sun — the
      worst regime; only reachable after the r4 daylength fix):
      measured 1.9e-5 over 10 days — this sets the base, 2.5e-5
    - ncol=262144 global grid, 80-day winter->spring integration (r5):
      running max 3.8e-5 and rising seasonally — above what a single
      48-step July window ever shows, which is what motivated the
      nsteps term (draws of the window max accumulate over a run)

    A real f32-radiation regression (1e-4+) fails at every size.
    Pure-f64 radiation (``mixed_radiation=False``) closes to ~1e-13 at
    any batch size and does not need this scaling.
    """
    import math
    n = ncol * nsteps / (8192.0 * 48.0)
    return base * math.sqrt(1.0 + max(0.0, math.log2(n)) / 2.0)


@dataclasses.dataclass
class GuardReport:
    ok: bool
    reasons: list[str]
    # a validated snapshot exists, so the caller MAY roll back via
    # StepGuard.restore_into (check() itself never mutates state)
    can_roll_back: bool


@dataclasses.dataclass
class StepGuard:
    """Validate each step's diagnostics; roll back primary variables on
    failure.  Thresholds of ``None`` disable the corresponding check.

    Checking requires a device->host pull of a few scalars per step;
    set ``every`` > 1 to amortize on large runs (rollback then restores
    the last *validated* snapshot, possibly several steps back).

    Works on both per-step :class:`StepDiagnostics` (full [ncol]
    fields) and window-reduced :class:`ScanDiagnostics` (pre-reduced
    ``*_max`` fields from ``run_scan``/``run_windows``) — the long-run
    production loop guards per window.  Pass ``ncol`` to scale the
    shortwave bound with batch size (:func:`errsol_bound`); an explicit
    ``errsol_max`` overrides it.
    """
    errh2o_max: float | None = 0.1
    # closed ledger (step.advance docstring): exact to rounding, so any
    # excursion is a real leak
    errh2o_led_max: float | None = 1e-9
    errh2osno_max: float | None = 1e-6
    errsol_max: float | None = 1e-6
    errseb_max: float | None = None   # reference's lwrad quirk inflates it
    every: int = 1
    ncol: int | None = None

    # sentinel default so an EXPLICIT errsol_max always wins over the
    # ncol-batch-scaled bound (an explicit 1e-6 used to be
    # indistinguishable from "unset" and silently replaced); the custom
    # __init__ suppresses the dataclass-generated one
    _ERRSOL_UNSET = object()

    def __init__(self, errh2o_max=0.1, errh2o_led_max=1e-9,
                 errh2osno_max=1e-6, errh2osno_steady_max=1e-7,
                 errsol_max=_ERRSOL_UNSET, errseb_max=None, every=1,
                 ncol=None):
        self.errh2o_max = errh2o_max
        self.errh2o_led_max = errh2o_led_max
        self.errh2osno_max = errh2osno_max
        # the re-timed, transition-masked snow balance (StepDiagnostics
        # .errh2osno_steady): closes to ~1e-15 when healthy (measured;
        # tests/test_snow_balance_guard.py), so unlike the reference's
        # printed errh2osno view it IS an invariant; 1e-7 leaves margin
        # for batch-scaled rounding at 262k+ columns (same reasoning as
        # the closed ledger's long-run bound)
        self.errh2osno_steady_max = errh2osno_steady_max
        self.errseb_max = errseb_max
        self.every = every
        self.ncol = ncol
        if errsol_max is StepGuard._ERRSOL_UNSET:
            # default bound: batch-scaled when ncol is known, the
            # homogeneous small-batch figure otherwise
            errsol_max = (errsol_bound(ncol) if ncol is not None
                          else 1e-6)
        self.errsol_max = errsol_max
        self._snapshot = None
        self._step = 0
        self.failures: list[tuple[int, list[str]]] = []

    def snapshot(self, state) -> None:
        self._snapshot = {k: np.array(v)
                          for k, v in primary_vars(state).items()}

    def check(self, state, diags) -> GuardReport:
        """Validate the post-step state/diagnostics.

        Never mutates ``state``: on failure the report lists the
        tripped bounds and ``can_roll_back`` says whether a validated
        snapshot exists — the caller decides whether to recover via
        :meth:`restore_into`.  On success the state becomes the new
        validated snapshot."""
        self._step += 1
        if self.every > 1 and (self._step % self.every) != 0:
            return GuardReport(True, [], False)

        reasons = []
        t = np.asarray(state.t_grnd)
        if not np.all(np.isfinite(t)):
            reasons.append("non-finite t_grnd")
        if not np.all(np.asarray(state.h2osno) >= 0.0):
            reasons.append("negative h2osno")
        for name, bound in (("errh2o", self.errh2o_max),
                            ("errh2o_led", self.errh2o_led_max),
                            ("errh2osno", self.errh2osno_max),
                            ("errh2osno_steady",
                             self.errh2osno_steady_max),
                            ("errsol", self.errsol_max),
                            ("errseb", self.errseb_max)):
            if bound is None:
                continue
            # StepDiagnostics carries the full [ncol] field; window
            # -reduced ScanDiagnostics carries pre-reduced "<name>_max"
            field = getattr(diags, name,
                            getattr(diags, name + "_max", None))
            if field is None:
                continue
            v = np.max(np.abs(np.asarray(field)))
            if not v <= bound:   # catches NaN too
                reasons.append(f"{name}={v:.3e} > {bound:g}")

        if reasons:
            self.failures.append((self._step, reasons))
            return GuardReport(False, reasons, self._snapshot is not None)
        self.snapshot(state)
        return GuardReport(True, [], False)

    def restore_into(self, state):
        """Return ``state`` with primary variables replaced by the last
        validated snapshot (raises if none exists)."""
        if self._snapshot is None:
            raise RuntimeError("no validated snapshot to restore")
        import jax.numpy as jnp
        return state._replace(
            **{k: jnp.asarray(v) for k, v in self._snapshot.items()})
