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


@dataclasses.dataclass
class MinimalInterface:
    """setup/advance/getPrimaryVars, mirroring the reference
    ``ELMInterface`` surface (``elm_kokkos_interface.hh``)."""
    ncol: int

    def __post_init__(self):
        self.model = Model(ncol=self.ncol)

    def setup(self):
        return self

    def advance(self, date: Date, dt_seconds: float) -> ExchangeFluxes:
        assert dt_seconds == self.model.dtime
        d: StepDiagnostics = self.model.advance(date)
        return ExchangeFluxes(
            qflx_rootsoi=np.asarray(d.qflx_rootsoi),
            qflx_top_soil=np.asarray(d.qflx_top_soil),
            qflx_evap_tot=np.asarray(d.qflx_evap_tot),
            eflx_sh_tot=np.asarray(d.eflx_sh_tot),
            eflx_lh_tot=np.asarray(d.eflx_lh_tot),
            eflx_lwrad_out=np.asarray(d.eflx_lwrad_out))

    def get_primary_vars(self) -> dict:
        """Deep-copied restart snapshot (reference ``copyPrimaryVars``,
        ``elm_kokkos_interface.cc:324-347``)."""
        return jax.tree.map(jnp.array,
                            checkpoint.primary_vars(self.model.state))

    def set_primary_vars(self, pv: dict) -> None:
        """Restore a snapshot (host-model convergence recovery)."""
        self.model.state = self.model.state._replace(**pv)
