"""Host-model (ATS-style) coupling interface.

Rebuild of the reference's ``MinimalInterface`` /
``interface_data_transfer`` sketch
(``/root/reference/driver/kokkos/minimal_elm_interface.cc``,
``interface_data_transfer.hh:6-127``): a host hydrology model provides
already-interpolated forcing and receives the exchange fluxes
(qflx_rootsoi, qflx_top_soil, evaporation terms) plus a PrimaryVars
snapshot for convergence recovery.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu.data.state import StepForcing, StepPhenology
from elmkernels_tpu.driver.model import Model
from elmkernels_tpu.driver.step import StepDiagnostics
from elmkernels_tpu.utils import checkpoint
from elmkernels_tpu.utils.dates import Date


class ExchangeFluxes(NamedTuple):
    """Surface fluxes exported to the host hydrology model
    (reference: ``interface_data_transfer.hh`` required-output list)."""
    qflx_rootsoi: np.ndarray     # [ncol, nlevgrnd] transpiration sink
    qflx_top_soil: np.ndarray    # water into top soil layer
    qflx_evap_tot: np.ndarray
    eflx_sh_tot: np.ndarray
    eflx_lh_tot: np.ndarray
    eflx_lwrad_out: np.ndarray


class HostForcing(NamedTuple):
    """Host-provided atmospheric forcing, already interpolated to the
    step time, [ncol] each — the reference ATS pathway's
    ``atm_data::AtmosphereFileInput`` (``input_containers.h:8-30``;
    required-input list ``interface_data_transfer.hh:6-127``).

    ``atm_qbot`` is specific humidity [kg/kg] (the host has already
    done any RH conversion).  ``atm_zbot`` is carried for interface
    parity but the step pins the forcing/observation heights exactly
    like the reference's ``ProcessZBOT`` functor does
    (``atm_physics.h``: hardwired 30 m)."""
    atm_tbot: np.ndarray
    atm_pbot: np.ndarray
    atm_qbot: np.ndarray
    atm_flds: np.ndarray
    atm_fsds: np.ndarray
    atm_prec: np.ndarray
    atm_wind: np.ndarray
    atm_zbot: np.ndarray | None = None


class HostPhenology(NamedTuple):
    """Host-provided phenology, already month-interpolated, [ncol] each
    (reference ``phen_data::PhenologyFileInput``,
    ``input_containers.h:33-45``); the snow-burial adjustment
    (Wang & Zeng) still runs inside the step, as in the reference's
    ``ComputePhenology``."""
    lai: np.ndarray
    sai: np.ndarray
    htop: np.ndarray
    hbot: np.ndarray


@dataclasses.dataclass
class MinimalInterface:
    """setup/advance/getPrimaryVars, mirroring the reference
    ``ELMInterface`` surface (``elm_kokkos_interface.hh``).

    Two forcing modes, matching the reference's two coupling designs:

    - :meth:`advance` — ELM drives its own forcing/phenology managers
      (the ``ELMInterface`` standalone mode);
    - :meth:`advance_with_forcing` — the HOST supplies per-step
      already-interpolated forcing and phenology
      (:class:`HostForcing`/:class:`HostPhenology`), bypassing the
      internal managers entirely — the ATS input-container pathway
      (``input_containers.h:8-45``, ``ELMState_ATS`` forc_* block in
      ``elm_state.h``).

    ``model_kw`` passes through to :class:`Model` (site arrays,
    precision modes, ...).
    """
    ncol: int
    model_kw: dict = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        self.model = Model(ncol=self.ncol, **self.model_kw)

    def setup(self):
        return self

    def _exchange(self, d: StepDiagnostics) -> ExchangeFluxes:
        return ExchangeFluxes(
            qflx_rootsoi=np.asarray(d.qflx_rootsoi),
            qflx_top_soil=np.asarray(d.qflx_top_soil),
            qflx_evap_tot=np.asarray(d.qflx_evap_tot),
            eflx_sh_tot=np.asarray(d.eflx_sh_tot),
            eflx_lh_tot=np.asarray(d.eflx_lh_tot),
            eflx_lwrad_out=np.asarray(d.eflx_lwrad_out))

    def advance(self, date: Date, dt_seconds: float) -> ExchangeFluxes:
        assert dt_seconds == self.model.dtime
        return self._exchange(self.model.advance(date))

    def advance_with_forcing(self, date: Date, dt_seconds: float,
                             atm: HostForcing,
                             phen: HostPhenology) -> ExchangeFluxes:
        """One dt driven by host-provided forcing.

        The host's already-interpolated values enter the step as a
        degenerate bracket (both samples equal, wt1=1): the on-device
        time interpolation reproduces them exactly, and all derived
        -forcing physics (theta/rho/qsat, FSDS spectral split, rain/snow
        partition) runs on device exactly as in the internal-manager
        mode — so both modes share one compiled executable."""
        assert dt_seconds == self.model.dtime
        m = self.model

        def arr(x):
            a = np.asarray(x, np.float64)
            if a.shape != (self.ncol,):
                raise ValueError(f"host forcing field shape {a.shape} "
                                 f"!= ({self.ncol},)")
            return a

        def pair(x):
            a = arr(x)
            return np.stack([a, a])

        forc = StepForcing(
            wt1=1.0, wt2=0.0, tbot=pair(atm.atm_tbot),
            pbot=pair(atm.atm_pbot), qbot=pair(atm.atm_qbot),
            flds=pair(atm.atm_flds), wind=pair(atm.atm_wind),
            fsds=arr(atm.atm_fsds), prec=arr(atm.atm_prec),
            decday=date.decimal_doy() + 1.0)
        forc = m._attach_aero(forc, date)
        phen_step = StepPhenology(
            wt1=1.0, wt2=0.0, mlai=pair(phen.lai), msai=pair(phen.sai),
            mhtop=pair(phen.htop), mhbot=pair(phen.hbot))
        forc = jax.tree.map(jnp.asarray, forc)
        phen_step = jax.tree.map(jnp.asarray, phen_step)
        m.state, d = self._host_step(m.snicar, m.params, m.psnveg,
                                     m.albveg, m.state, forc, phen_step)
        return self._exchange(d)

    @property
    def _host_step(self):
        """The jitted step pinned to ``qbot_is_rh=False``: the
        HostForcing contract says ``atm_qbot`` is already specific
        humidity, so the host pathway must not inherit an RH->q
        conversion baked into the model's internal forcing provider
        (which would convert twice).  Same executable as ``m._step``
        whenever the model's provider is already q-based."""
        import functools
        from elmkernels_tpu.driver.model import _jitted_step
        m = self.model
        return functools.partial(
            _jitted_step, m.land, m.dtime, m.elm_correct_snow_aging,
            m.psn_mode, False, m.mixed_radiation, m.elm_correct_seb,
            m.warm_start, m.het_ltype, m.mixed_canopy)

    def get_primary_vars(self) -> dict:
        """Deep-copied restart snapshot (reference ``copyPrimaryVars``,
        ``elm_kokkos_interface.cc:324-347``)."""
        return jax.tree.map(jnp.array,
                            checkpoint.primary_vars(self.model.state))

    def set_primary_vars(self, pv: dict) -> None:
        """Restore a snapshot (host-model convergence recovery)."""
        self.model.state = self.model.state._replace(**pv)

    def snapshot(self):
        """Deep-copy of the FULL model state.

        The reference's ``PrimaryVars`` subset (``elm_state.h:15-48``)
        is its *belief* of what convergence recovery needs, never
        exercised; exact re-advance after a failed step also requires
        the carried non-primary state (t_veg/t10, snow aerosol masses,
        previous-step fluxes, solver warm-start carries), so the
        recovery loop here snapshots everything — a disclosed deviation
        that makes rollback bit-exact (asserted in
        tests/test_interface.py)."""
        return jax.tree.map(jnp.array, self.model.state)

    def restore(self, snap) -> None:
        """Restore a :meth:`snapshot`.  Copies, never aliases: every
        jitted step donates the state argument, so aliasing ``snap``
        into ``model.state`` would let the first post-restore advance
        delete the snapshot's buffers — a recovery loop retrying from
        the same snapshot twice (this API's whole purpose) would then
        hit deleted-buffer errors on TPU/GPU."""
        self.model.state = jax.tree.map(jnp.array, snap)
