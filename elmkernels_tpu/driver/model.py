"""Host-side model API: setup, the jitted/pjit step, and the time loop.

TPU-native replacement for the reference's ``ELMInterface``
(``/root/reference/driver/kokkos/elm_kokkos_interface.cc:38-356``) and
``kokkos_driver.cc``.  Device work is one fused jitted step per dt; host
work per step is only calendar arithmetic and forcing-window assembly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.data import forcing as forcing_mod
from elmkernels_tpu.data import params as params_mod
from elmkernels_tpu.data.state import (ModelParams, ModelState, StepForcing,
                                       StepPhenology, cold_start)
from elmkernels_tpu.driver import step as step_mod
from elmkernels_tpu.utils.dates import Date

DEFAULT_PFT_PATH = "/root/reference/test/data/clm_params_c180524.nc"
DEFAULT_SNICAR_PATH = "/root/reference/test/data/SnowOptics_IN.txt"


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                   donate_argnums=(6,))
def _jitted_step(land, psnveg, albveg, dtime, snicar, params, state, forc,
                 phen):
    """Shared jitted step; land/PFT traits/dtime are static (hashable), so
    all Model instances with the same configuration and shapes share one
    compiled executable."""
    return step_mod.advance(land, psnveg, albveg, snicar, params, state,
                            forc, phen, dtime)


@dataclasses.dataclass
class Model:
    """A batch of independent land columns + the jitted step."""
    ncol: int
    dtime: float = 1800.0
    vtype: int = 12
    pft_path: str = DEFAULT_PFT_PATH
    snicar_path: str = DEFAULT_SNICAR_PATH
    lat_deg: float = 71.323
    lon_deg: float = 203.3886
    sharding=None  # optional NamedSharding for the column axis

    def __post_init__(self):
        self.land = c.LandType(ltype=1, ctype=1, vtype=self.vtype)
        self.psnveg = params_mod.load_pft_psn(self.pft_path, self.vtype)
        self.albveg = params_mod.load_pft_alb(self.pft_path, self.vtype)
        self.snicar = params_mod.load_snicar_from_text(self.snicar_path)
        self.params = params_mod.default_params(
            self.ncol, self.pft_path, self.vtype, self.lat_deg,
            self.lon_deg)
        self.state = cold_start(self.ncol)
        self.forcing = forcing_mod.SyntheticForcing(
            self.ncol, np.asarray(self.params.lat_r),
            np.asarray(self.params.lon_r))
        self.phenology = forcing_mod.SyntheticPhenology(self.ncol)
        if self.sharding is not None:
            self.state = jax.device_put(self.state, self._state_sharding())
            self.params = jax.device_put(self.params,
                                         self._params_sharding())
        self._step = functools.partial(_jitted_step, self.land,
                                       self.psnveg, self.albveg,
                                       self.dtime)

    def _state_sharding(self):
        from jax.sharding import PartitionSpec as P
        from jax.sharding import NamedSharding
        mesh = self.sharding.mesh
        return jax.tree.map(
            lambda x: NamedSharding(
                mesh, P("col", *([None] * (np.ndim(x) - 1)))), self.state)

    def _params_sharding(self):
        from jax.sharding import PartitionSpec as P
        from jax.sharding import NamedSharding
        mesh = self.sharding.mesh

        def spec(x):
            # lookup tables are replicated; per-column arrays shard on col
            if np.ndim(x) >= 1 and x.shape[0] == self.ncol:
                return NamedSharding(mesh,
                                     P("col", *([None] * (np.ndim(x) - 1))))
            return NamedSharding(mesh, P())
        return jax.tree.map(spec, self.params)

    def advance(self, date: Date) -> step_mod.StepDiagnostics:
        """One dt starting at ``date``; mutates self.state."""
        forc = self.forcing.window(date, self.dtime)
        phen = self.phenology.window(date)
        forc = jax.tree.map(jnp.asarray, forc)
        phen = jax.tree.map(jnp.asarray, phen)
        self.state, diags = self._step(self.snicar, self.params, self.state,
                                       forc, phen)
        return diags

    def run(self, start: Date, nsteps: int,
            callback: Callable | None = None):
        """Tick the time loop (reference: ``kokkos_driver.cc:50-85``)."""
        date = start.copy()
        last = None
        for _ in range(nsteps):
            last = self.advance(date)
            if callback is not None:
                callback(date, self.state, last)
            date.increment_seconds(int(self.dtime))
        return last
