"""Host-side model API: setup, the jitted/pjit step, and the time loop.

TPU-native replacement for the reference's ``ELMInterface``
(``/root/reference/driver/kokkos/elm_kokkos_interface.cc:38-356``) and
``kokkos_driver.cc``.  Device work is one fused jitted step per dt; host
work per step is only calendar arithmetic and forcing-window assembly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from elmkernels_tpu import constants as c
from elmkernels_tpu.data import forcing as forcing_mod
from elmkernels_tpu.data import params as params_mod
from elmkernels_tpu.data.state import (ModelParams, ModelState, StepForcing,
                                       StepPhenology, cold_start)
from elmkernels_tpu.driver import step as step_mod
from elmkernels_tpu.utils import packing
from elmkernels_tpu.utils.dates import Date

DEFAULT_PFT_PATH = "/root/reference/test/data/clm_params_c180524.nc"
DEFAULT_SNICAR_PATH = "/root/reference/test/data/SnowOptics_IN.txt"


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
                   donate_argnums=(14,))
def _jitted_step(land, dtime, aging_fix, psn_mode, qbot_is_rh, mixed_rad,
                 seb_fix, warm, het_lt, mixed_can, snicar, params, psnveg,
                 albveg, state, forc, phen):
    """Shared jitted step; land/dtime/flags/psn_mode are static, PFT
    traits are traced data (scalars for a homogeneous domain, [ncol]
    arrays for per-column vegetation), so all Model instances with the
    same configuration and shapes share one compiled executable."""
    return step_mod.advance(land, psnveg, albveg, snicar, params, state,
                            forc, phen, dtime,
                            elm_correct_snow_aging=aging_fix,
                            psn_mode=psn_mode, qbot_is_rh=qbot_is_rh,
                            mixed_radiation=mixed_rad,
                            elm_correct_seb=seb_fix, warm_start=warm,
                            het_ltype=het_lt, mixed_canopy=mixed_can)


class ScanDiagnostics(NamedTuple):
    """Per-step domain reductions from a scanned run ([nsteps] each) —
    the reference's MPI ``min_max_sum`` diagnostics
    (``utils.hh:45-103``) computed on device instead of by collective."""
    errh2o_max: jnp.ndarray
    errh2o_led_max: jnp.ndarray
    errh2osno_max: jnp.ndarray
    errh2osno_steady_max: jnp.ndarray
    errsol_max: jnp.ndarray
    errlon_max: jnp.ndarray
    errseb_max: jnp.ndarray
    eflx_sh_mean: jnp.ndarray
    eflx_lh_mean: jnp.ndarray
    fsa_mean: jnp.ndarray
    t_ref2m_mean: jnp.ndarray
    niters_canopy_max: jnp.ndarray
    niters_canopy_mean: jnp.ndarray
    niters_ci_mean: jnp.ndarray


@functools.partial(jax.jit,
                   static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
                   donate_argnums=(15,))
def _jitted_scan(land, dtime, aging_fix, psn_mode, qbot_is_rh, mixed_rad,
                 seb_fix, warm, het_lt, mixed_can, packed, snicar, params,
                 psnveg, albveg, state, forc_stack, phen_stack):
    """K timesteps inside ONE executable via ``lax.scan`` — amortizes
    dispatch (the dominant cost at small batch on a remote-tunnel
    backend) and lets XLA overlap steps' epilogue/prologue.  The
    reference has no analog: its time loop is host-side
    (``kokkos_driver.cc:50-85``), one kernel volley per step.

    ``packed=True`` carries the state across the scan boundary as a few
    dtype-fused buffers instead of ~41 separate leaves (exactness
    contract in :mod:`elmkernels_tpu.utils.packing`)."""
    def step(st, fp):
        forc, phen = fp
        return step_mod.advance(land, psnveg, albveg, snicar, params, st,
                                forc, phen, dtime,
                                elm_correct_snow_aging=aging_fix,
                                psn_mode=psn_mode, qbot_is_rh=qbot_is_rh,
                                mixed_radiation=mixed_rad,
                                elm_correct_seb=seb_fix, warm_start=warm,
                                het_ltype=het_lt, mixed_canopy=mixed_can)
    return _scan_state(step, state, (forc_stack, phen_stack), packed)


def _scan_state(step, state, xs, packed):
    """``lax.scan`` of ``step`` over the state carry, optionally packed
    into per-dtype fused buffers across the loop boundary."""
    if not packed:
        def body(st, x):
            st, d = step(st, x)
            return st, _reduce_diags(d)
        return jax.lax.scan(body, state, xs)
    template = [(a.shape, a.dtype) for a in state]
    cls = type(state)

    def body(carry, x):
        st, d = step(packing.unpack_tree(carry, template, cls), x)
        return packing.pack_tree(st), _reduce_diags(d)
    carry, diags = jax.lax.scan(body, packing.pack_tree(state), xs)
    return packing.unpack_tree(carry, template, cls), diags


def _reduce_diags(d) -> ScanDiagnostics:
    return ScanDiagnostics(
        errh2o_max=jnp.abs(d.errh2o).max(),
        errh2o_led_max=jnp.abs(d.errh2o_led).max(),
        errh2osno_max=jnp.abs(d.errh2osno).max(),
        errh2osno_steady_max=jnp.abs(d.errh2osno_steady).max(),
        errsol_max=jnp.abs(d.errsol).max(),
        errlon_max=jnp.abs(d.errlon).max(),
        errseb_max=jnp.abs(d.errseb).max(),
        eflx_sh_mean=d.eflx_sh_tot.mean(),
        eflx_lh_mean=d.eflx_lh_tot.mean(),
        fsa_mean=d.fsa.mean(),
        t_ref2m_mean=d.t_ref2m.mean(),
        niters_canopy_max=d.niters_canopy.max(),
        niters_canopy_mean=d.niters_canopy.mean(),
        niters_ci_mean=d.niters_ci.mean())


@functools.partial(jax.jit,
                   static_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
                   donate_argnums=(15,))
def _jitted_scan_series(land, dtime, aging_fix, psn_mode, qbot_is_rh,
                        mixed_rad, seb_fix, warm, het_lt, mixed_can,
                        packed, snicar, params, psnveg, albveg, state,
                        series, steps, phen_uniq, phen_steps,
                        aero_uniq=None):
    """K timesteps over a forcing SERIES: the raw forcing-grid samples
    ([nt, ncol], loop-invariant) plus tiny per-step bracket
    indices/weights, with the bracketing-pair gathers done ON DEVICE in
    the scan body.  Bit-identical to :func:`_jitted_scan` fed the
    equivalent per-step stacks, but ships ~dtf/dt-fold fewer forcing
    bytes to the device — the production ingest layout at scale, and the
    reference's own windowed design (``atm_data_impl.hh:248-319``).

    ``aero_uniq`` ([nuniq, 2, 11, ncol], the monthly deposition bracket
    pairs in AERO_DEP_KEYS order) carries the aerosol stream; its
    monthly interpolation shares the phenology bracket index/weights
    (both are ``monthly_data_weights`` streams) and runs on device with
    the same f64 multiply-add as the host ``_attach_aero`` path."""
    def step(st, xs):
        sc, (pidx, pwt1, pwt2) = xs

        def row(a, i):
            # promote AFTER the gather: series vars may ship at source
            # precision (on-disk f32, data/forcing.py ship_source_dtype)
            # — promoting the two gathered bracket rows reproduces the
            # host's f64 read bit-for-bit at half the H2D bytes
            r = jax.lax.dynamic_index_in_dim(a, i, axis=0,
                                             keepdims=False)
            ft = jnp.result_type(float)  # f64; f32 when x64 is off
            return r.astype(ft) if (r.dtype != ft
                                    and r.dtype.kind == "f") else r

        def pair(a):
            return jnp.stack([row(a, sc.idx1), row(a, sc.idx1 + 1)])
        aero = None
        if aero_uniq is not None:
            ab = row(aero_uniq, pidx)      # [2, 11, ncol]
            aero = pwt1 * ab[0] + pwt2 * ab[1]
        forc = StepForcing(
            wt1=sc.wt1, wt2=sc.wt2, tbot=pair(series.tbot),
            pbot=pair(series.pbot), qbot=pair(series.qbot),
            flds=pair(series.flds), wind=pair(series.wind),
            fsds=row(series.fsds, sc.idx1), prec=row(series.prec, sc.idx1),
            decday=sc.decday, aero=aero)
        phen = StepPhenology(
            wt1=pwt1, wt2=pwt2, mlai=row(phen_uniq.mlai, pidx),
            msai=row(phen_uniq.msai, pidx),
            mhtop=row(phen_uniq.mhtop, pidx),
            mhbot=row(phen_uniq.mhbot, pidx))
        return step_mod.advance(land, psnveg, albveg, snicar, params, st,
                                forc, phen, dtime,
                                elm_correct_snow_aging=aging_fix,
                                psn_mode=psn_mode, qbot_is_rh=qbot_is_rh,
                                mixed_radiation=mixed_rad,
                                elm_correct_seb=seb_fix, warm_start=warm,
                                het_ltype=het_lt, mixed_canopy=mixed_can)
    return _scan_state(step, state, (steps, phen_steps), packed)


@dataclasses.dataclass
class Model:
    """A batch of independent land columns + the jitted step.

    ``vtype`` may be an int (homogeneous vegetation, traits fold to
    scalars) or an [ncol] sequence of PFT indices (per-column vegetation:
    traits are gathered from the clm_params trait matrix per column, and
    the photosynthesis pathway compiles "mixed" when C3 and C4 PFTs
    coexist — reference ``initialize_elm_kokkos.cc:374-431``)."""
    ncol: int
    dtime: float = 1800.0
    vtype: int | list | tuple = 12
    pft_path: str = DEFAULT_PFT_PATH
    # SNICAR optics: a snicar_optics_5bnd*.nc NetCDF (dispatched by .nc
    # extension to data.snicar_data.read_snicar_data, the reference's
    # initialize_elm_kokkos.cc:23-47 pathway) or the SnowOptics text
    # fixture (the only optics source shipped with the test data)
    snicar_path: str = DEFAULT_SNICAR_PATH
    # snicar_drdt_bst*.nc snow-aging tables (reference
    # initialize_elm_kokkos.cc:49-60); None keeps synthetic placeholder
    # tables, which are inert under the reference's double-clamp default
    # but are REFUSED when elm_correct_snow_aging=True runs the live
    # Flanner-Zender pipeline
    snow_aging_path: str | None = None
    # site arrays — each accepts a scalar (uniform domain, the reference
    # driver's hardwired site) or an [ncol] array (texture: or
    # [ncol, nlevsoi]) for a surfdata-driven heterogeneous grid; see
    # Model.from_surfdata
    lat_deg: float | np.ndarray = 71.323
    lon_deg: float | np.ndarray = 203.3886
    # landunit type: an int (domain-static, branches fold at trace time —
    # the reference's one-LandType-per-domain model) or an [ncol] array
    # (per-column masked land classes: mixed soil/ice/wet batches)
    ltype: int | np.ndarray = 1
    soil_color: int | np.ndarray = 15
    mxsoil_color: int = 20
    pct_sand: float | np.ndarray = 40.0
    pct_clay: float | np.ndarray = 20.0
    organic: float | np.ndarray = 10.0
    # raw topographic slope and standard deviation of elevation (the
    # reference hardwires the Utqiagvik site values,
    # elm_kokkos_interface.cc:92-96; surfdata carries SLOPE/STD_ELEV)
    topo_slope_raw: float | np.ndarray = 0.070044865858546
    topo_std: float | np.ndarray = 3.96141847422387
    # month-per-file NetCDF forcing basename ("<basename>YYYY-MM.nc",
    # reference read_input.hh); None selects the synthetic forcing
    forcing_basename: str | None = None
    # surfdata NetCDF with MONTHLY_LAI/SAI/HEIGHT_* (12, pft, cells);
    # None selects the synthetic phenology climatology
    phenology_path: str | None = None
    # aerosoldep_monthly*.nc deposition climatology (12, cells); None
    # keeps the static ModelParams.aero_* rates (the reference driver
    # also ships with its monthly manager disabled)
    aerosol_path: str | None = None
    col0: int = 0  # global column offset of this host's shard
    sharding=None  # optional NamedSharding for the column axis
    # ELM-proper snow grain aging (fixes the reference's double clamp;
    # see snow_hydrology.snow_aging). Default False = reference-exact.
    elm_correct_snow_aging: bool = False
    # Production default: run the SNICAR + two-stream radiative solvers
    # in f32 inside the f64 step (see step.advance).  Contract: water
    # ledger stays exact, errsol ~1e-6 W/m2 instead of 1e-13, state
    # drift vs pure f64 < 0.05 K over 2 days (tests/test_mixed_radiation).
    # Set False for the reference-exact pure-f64 radiative solvers.
    mixed_radiation: bool = True
    # fix the reference's dropped-linearization in eflx_soil_grnd
    # (surface_fluxes.update_surface_fluxes docstring); closes errseb.
    # Default False = reference-exact.
    elm_correct_seb: bool = False
    # PRODUCTION DEFAULT (promoted r4 on season-scale drift evidence,
    # tools/mixed_canopy_drift.py: 15 days x {winter, summer} on the
    # heterogeneous global grid, state drift < 0.1 K, ledger < 5e-9,
    # radiation closures unchanged): warm-start the canopy stability /
    # ci solvers from the previous step's converged obu/ci.  Converged
    # physics unchanged; iteration counts — and hence last-ulp rounding
    # — differ from the reference's cold start.  False restores
    # reference-exact cold-start iteration sequences.
    warm_start: bool = True
    # PRODUCTION DEFAULT (same r4 evidence): run the canopy
    # stability-loop interior in f32 with f64 prognostic handoff (the
    # roofline-named 1.2 ms/step emulated-f64 hotspot, BASELINE.md
    # roofline r3).  False restores the f64 loop interior.
    mixed_canopy: bool = True
    # Opt-in (r5): carry the state across the lax.scan boundary as a
    # few dtype-fused [ncol, K] buffers instead of ~41 separate leaves,
    # attacking the r5 roofline's named limiter (per-leaf HBM<->VMEM
    # staging copy pairs at the scan step; BASELINE.md roofline r5).
    # State bit-identical over short horizons; at season scale a
    # last-ulp fusion-contraction difference can appear in one carried
    # flux (see utils/packing.py; tests/test_packed_carry.py).
    packed_carry: bool = False

    def __post_init__(self):
        vt = np.asarray(self.vtype, np.int32)
        lt = np.asarray(self.ltype, np.int32)
        self.het_ltype = lt.ndim > 0
        if self.het_ltype and lt.shape != (self.ncol,):
            raise ValueError(f"ltype shape {lt.shape} != ({self.ncol},)")
        # the static land object always carries an int ltype (it is a
        # hashable jit-static); per-column ltype rides in params and is
        # swapped in inside the trace (step.advance het_ltype)
        ltype0 = int(lt) if not self.het_ltype else c.ISTSOIL
        if vt.ndim == 0:
            self.land = c.LandType(ltype=ltype0, ctype=1, vtype=int(vt))
            self.psnveg = params_mod.load_pft_psn(self.pft_path, int(vt))
            self.albveg = params_mod.load_pft_alb(self.pft_path, int(vt))
        else:
            if vt.shape != (self.ncol,):
                raise ValueError(
                    f"vtype shape {vt.shape} != ({self.ncol},)")
            self.land = c.LandType(ltype=ltype0, ctype=1, vtype=int(vt[0]))
            table = params_mod.load_pft_table(self.pft_path)
            self.psnveg = params_mod.gather_pft_psn(table, vt)
            self.albveg = params_mod.gather_pft_alb(table, vt)
        from elmkernels_tpu.physics.photosynthesis import psn_mode_of
        self.psn_mode = psn_mode_of(self.psnveg)
        if str(self.snicar_path).endswith(".nc"):
            from elmkernels_tpu.data.snicar_data import read_snicar_data
            self.snicar = read_snicar_data(self.snicar_path)
        else:
            self.snicar = params_mod.load_snicar_from_text(self.snicar_path)
        snowage_tables = None
        if self.snow_aging_path is not None:
            from elmkernels_tpu.data.snicar_data import read_snowrds_data
            snowage_tables = read_snowrds_data(self.snow_aging_path)
        elif self.elm_correct_snow_aging:
            raise ValueError(
                "elm_correct_snow_aging=True runs the live Flanner-Zender "
                "aging pipeline, which needs real snicar_drdt_bst*.nc "
                "tables: pass snow_aging_path=... (the synthetic "
                "placeholder tables are only valid under the "
                "reference-exact default, where the double clamp makes "
                "them inert)")
        self.params = params_mod.default_params(
            self.ncol, self.pft_path, self.vtype, self.lat_deg,
            self.lon_deg, soil_color=self.soil_color,
            pct_sand=self.pct_sand, pct_clay=self.pct_clay,
            organic=self.organic, mxsoil_color=self.mxsoil_color,
            snowage_tables=snowage_tables, ltype=self.ltype,
            topo_slope_raw=self.topo_slope_raw, topo_std=self.topo_std)
        self.state = cold_start(self.ncol)
        if self.het_ltype or self.land.ltype != c.ISTSOIL:
            self.state = self._ltype_cold_start(self.state)
        if self.forcing_basename is not None:
            self.forcing = forcing_mod.NetCDFForcing(
                self.forcing_basename, self.ncol,
                np.asarray(self.params.lat_r),
                np.asarray(self.params.lon_r), col0=self.col0)
        else:
            self.forcing = forcing_mod.SyntheticForcing(
                self.ncol, np.asarray(self.params.lat_r),
                np.asarray(self.params.lon_r))
        if self.phenology_path is not None:
            from elmkernels_tpu.data.phenology_data import \
                PhenologyDataManager
            self.phenology = PhenologyDataManager(
                self.phenology_path, self.ncol,
                np.broadcast_to(vt, (self.ncol,)).astype(np.int32),
                col0=self.col0)
        else:
            self.phenology = forcing_mod.SyntheticPhenology(self.ncol)
        if self.aerosol_path is not None:
            from elmkernels_tpu.data.aerosol_data import AerosolDataManager
            self.aerosol = AerosolDataManager(self.aerosol_path, self.ncol,
                                              col0=self.col0)
        else:
            self.aerosol = None
        if self.sharding is not None:
            self.state = jax.device_put(self.state, self._state_sharding())
            self.params = jax.device_put(self.params,
                                         self._params_sharding())
        self._step = functools.partial(
            _jitted_step, self.land, self.dtime,
            self.elm_correct_snow_aging, self.psn_mode,
            getattr(self.forcing, "qbot_is_rh", False),
            self.mixed_radiation, self.elm_correct_seb, self.warm_start,
            self.het_ltype, self.mixed_canopy)

    def _ltype_cold_start(self, state):
        """Re-derive the cold-start temperature/water profiles for
        non-soil landunits: the hardwired reference IC (cold_start) is a
        soil column; ice/wet columns take the reference's init kernels
        instead (``init_soil_temp``/``init_soilh2o_state``,
        ``initialize_elm_kokkos.cc:374-431``) so an ice sheet starts
        ice-filled at 250 K rather than as near-empty soil."""
        from elmkernels_tpu.physics import init_state as ini
        lt = np.asarray(self.ltype, np.int32)
        land_i = c.LandType(
            ltype=(jnp.asarray(lt) if self.het_ltype else int(lt)),
            ctype=1, vtype=self.land.vtype)
        t, t_grnd = ini.init_soil_temp(land_i, state.snl, self.ncol,
                                       state.t_soisno.dtype)
        vol, liq, ice = ini.init_soilh2o_state(land_i, state.snl,
                                               self.params.watsat, t,
                                               state.dz)
        nonsoil = jnp.asarray(
            np.broadcast_to((lt != c.ISTSOIL) & (lt != c.ISTCROP),
                            (self.ncol,)))
        m1 = nonsoil[:, None]
        return state._replace(
            t_soisno=jnp.where(m1, t, state.t_soisno),
            t_grnd=jnp.where(nonsoil, t_grnd, state.t_grnd),
            h2osoi_vol=jnp.where(m1, vol, state.h2osoi_vol),
            h2osoi_liq=jnp.where(m1, liq, state.h2osoi_liq),
            h2osoi_ice=jnp.where(m1, ice, state.h2osoi_ice))

    @classmethod
    def from_surfdata(cls, surfdata_path: str, ncol: int, col0: int = 0,
                      **kw) -> "Model":
        """Construct a heterogeneous-grid Model from one surfdata-style
        NetCDF: per-column lat/lon, soil color, soil texture profiles,
        and (when PCT_NAT_PFT or PFT is present) per-column dominant PFT
        — the realistic-global-run construction path (reference:
        ``initialize_elm_kokkos.cc:267-340`` + ``utils.cc:46-69``).

        ``col0``/``ncol`` select this host's shard of the flattened cell
        axis.  Any Model field (``forcing_basename``, ``sharding``, ...)
        passes through ``**kw``; an explicit ``vtype`` in ``kw``
        overrides the file's PFT map."""
        from elmkernels_tpu.data.surfdata import read_surfdata
        sd = read_surfdata(surfdata_path, ncol, col0)
        if "vtype" not in kw:
            kw["vtype"] = (sd.vtype.tolist() if sd.vtype is not None
                           else cls.vtype)
        for field, val in (("topo_slope_raw", sd.topo_slope),
                           ("topo_std", sd.topo_std)):
            if val is not None and field not in kw:
                kw[field] = val
        return cls(ncol=ncol, col0=col0, lat_deg=sd.lat_deg,
                   lon_deg=sd.lon_deg, soil_color=sd.soil_color,
                   mxsoil_color=sd.mxsoil_color, pct_sand=sd.pct_sand,
                   pct_clay=sd.pct_clay, organic=sd.organic, **kw)

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

    def _attach_aero(self, forc: StepForcing, date: Date) -> StepForcing:
        if self.aerosol is None:
            return forc
        from elmkernels_tpu.data.state import AERO_DEP_KEYS
        rates = self.aerosol.rates(date)
        return forc._replace(
            aero=np.stack([rates[k] for k in AERO_DEP_KEYS]))

    def advance(self, date: Date) -> step_mod.StepDiagnostics:
        """One dt starting at ``date``; mutates self.state."""
        forc = self._attach_aero(self.forcing.window(date, self.dtime),
                                 date)
        phen = self.phenology.window(date)
        forc = jax.tree.map(jnp.asarray, forc)
        phen = jax.tree.map(jnp.asarray, phen)
        self.state, diags = self._step(self.snicar, self.params,
                                       self.psnveg, self.albveg,
                                       self.state, forc, phen)
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

    def stack_windows(self, start: Date, nsteps: int):
        """Host-assemble [nsteps]-stacked forcing/phenology pytrees.

        Delegates to :meth:`host_windows` (numpy, strong dtypes) so the
        stacks carry EXACTLY the same avals as ``run_windows``'s ingest
        path — ``run_scan`` and ``run_windows`` then share one compiled
        executable instead of compiling weak-vs-strong-typed twins."""
        forcs, phens = self.host_windows(start, nsteps)
        return jax.tree.map(jnp.asarray, (forcs, phens))

    def run_scan(self, start: Date, nsteps: int) -> ScanDiagnostics:
        """Advance ``nsteps`` inside one ``lax.scan`` executable; mutates
        self.state.  Returns [nsteps]-shaped domain-reduced diagnostics."""
        forc_stack, phen_stack = self.stack_windows(start, nsteps)
        self.state, diags = _jitted_scan(
            self.land, self.dtime, self.elm_correct_snow_aging,
            self.psn_mode, getattr(self.forcing, "qbot_is_rh", False),
            self.mixed_radiation, self.elm_correct_seb, self.warm_start,
            self.het_ltype, self.mixed_canopy, self.packed_carry,
            self.snicar, self.params, self.psnveg, self.albveg,
            self.state, forc_stack, phen_stack)
        return diags

    def _phen_stack(self, start: Date, nsteps: int):
        date = start.copy()
        phens = []
        for _ in range(nsteps):
            phens.append(self.phenology.window(date))
            date.increment_seconds(int(self.dtime))
        return jax.tree.map(lambda *xs: np.stack([np.asarray(x)
                                                  for x in xs]), *phens)

    def _host_series(self, start: Date, nsteps: int):
        """Host-assemble the forcing SERIES ingest payload: raw
        forcing-grid samples + per-step indices/weights + the monthly
        phenology/aerosol bracket pairs — ~dtf/dt-fold fewer bytes than
        :meth:`host_windows`' per-step stacks (BASELINE.md r3 ingest
        section).  Works for both forcing providers
        (``SyntheticForcing.series`` and ``NetCDFForcing.series``)."""
        from elmkernels_tpu.utils.dates import month_indices
        ser, steps = self.forcing.series(start, nsteps, self.dtime)
        # pad nt to the worst-case span so every window shares one
        # compiled executable (alignment makes nt vary by +-1)
        ntfix = int(np.ceil(nsteps * self.dtime
                            / self.forcing.dt_forcing)) + 2
        pad = ntfix - ser.tbot.shape[0]
        if pad > 0:
            ser = jax.tree.map(
                lambda a: np.concatenate([a, np.repeat(a[-1:], pad, 0)]),
                ser)
        # monthly streams (phenology, aerosol deposition): the bracket
        # slices are identical for every step of a window except across
        # a month rollover (<=2 unique (m1, m2) pairs) — ship the unique
        # pairs once + per-step indices/weights instead of nsteps copies
        # (cuts the monthly payload ~nsteps/2-fold); the linear monthly
        # interpolation runs on device with the same f64 arithmetic as
        # the host path, so trajectories stay bit-identical
        date = start.copy()
        mkeys, uniq, uniq_aero, idxs, wt1s, wt2s = [], [], [], [], [], []
        for _ in range(nsteps):
            key = month_indices(date)
            ph = self.phenology.window(date)
            if key not in mkeys:
                mkeys.append(key)
                uniq.append(ph)
                if self.aerosol is not None:
                    uniq_aero.append(self.aerosol.bracket(date))
            idxs.append(mkeys.index(key))
            wt1s.append(ph.wt1)
            wt2s.append(ph.wt2)
            date.increment_seconds(int(self.dtime))
        # pad to >=2 unique pairs so window-sized executables share a
        # shape (at most one rollover fits in any window under a month)
        while len(uniq) < 2:
            uniq.append(uniq[-1])
            if self.aerosol is not None:
                uniq_aero.append(uniq_aero[-1])
        phen_uniq = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *uniq)
        phen_steps = (np.asarray(idxs, np.int32), np.asarray(wt1s),
                      np.asarray(wt2s))
        aero_uniq = (np.stack(uniq_aero) if self.aerosol is not None
                     else None)
        return ser, steps, (phen_uniq, phen_steps), aero_uniq

    def run_scan_series(self, start: Date, nsteps: int) -> ScanDiagnostics:
        """``run_scan`` over the series ingest layout — bit-identical
        trajectories, far fewer forcing bytes shipped; mutates
        self.state."""
        ser, steps, (phen_uniq, phen_steps), aero_uniq = jax.tree.map(
            jnp.asarray, self._host_series(start, nsteps),
            is_leaf=lambda x: isinstance(x, np.ndarray))
        self.state, diags = _jitted_scan_series(
            self.land, self.dtime, self.elm_correct_snow_aging,
            self.psn_mode, getattr(self.forcing, "qbot_is_rh", False),
            self.mixed_radiation, self.elm_correct_seb, self.warm_start,
            self.het_ltype, self.mixed_canopy, self.packed_carry,
            self.snicar, self.params, self.psnveg, self.albveg,
            self.state, ser, steps, phen_uniq, phen_steps, aero_uniq)
        return diags

    def host_windows(self, start: Date, nsteps: int):
        """``stack_windows`` but strictly host-side: numpy stacks, zero
        device work — safe to run on a prefetch thread while the device
        computes (the reference reads its forcing window synchronously
        between steps, ``atm_data_impl.hh:248-319``; this is the
        overlapped replacement)."""
        date = start.copy()
        forcs, phens = [], []
        for _ in range(nsteps):
            forcs.append(self._attach_aero(
                self.forcing.window(date, self.dtime), date))
            phens.append(self.phenology.window(date))
            date.increment_seconds(int(self.dtime))

        def stack(ws):
            return jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]), *ws)
        return stack(forcs), stack(phens)

    def _window_sharding(self, tree):
        """NamedSharding for [nsteps, ...] forcing stacks: shard any axis
        of extent ncol on 'col', replicate the rest."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        mesh = self.sharding.mesh

        def spec(x):
            return NamedSharding(mesh, P(*[
                "col" if n == self.ncol else None for n in np.shape(x)]))
        return jax.tree.map(spec, tree)

    def run_windows(self, start: Date, nsteps: int, window: int = 48,
                    callback: Callable | None = None,
                    series: bool = False) -> ScanDiagnostics:
        """Advance ``nsteps`` as ``nsteps//window`` scan executables with
        the NEXT window's host assembly + H2D transfer overlapped against
        the CURRENT window's device compute (double buffer).

        This is the production ingest loop at scale (BASELINE config 5):
        ``run_scan`` host-assembles the whole [nsteps, ncol] stack up
        front — a memory wall and dead device time for month-long runs —
        while here at most two [window, ncol] stacks are live at once.
        ``callback(date, state, diags)`` fires per window with the
        window's reduced diagnostics.

        ``series=True`` ships each window in the forcing-series layout
        (raw forcing-grid samples + per-step bracket indices, with the
        bracket gathers done on device) — bit-identical trajectories,
        ~dtf/dt-fold fewer H2D bytes (BASELINE.md r3 ingest section)."""
        if nsteps % window:
            raise ValueError(f"nsteps={nsteps} not a multiple of "
                             f"window={window} (one executable per shape)")
        import concurrent.futures as cf

        def put(stacks):
            if self.sharding is not None:
                return jax.device_put(stacks, self._window_sharding(stacks))
            return jax.device_put(stacks)

        host_fn = self._host_series if series else self.host_windows
        statics = (self.land, self.dtime, self.elm_correct_snow_aging,
                   self.psn_mode,
                   getattr(self.forcing, "qbot_is_rh", False),
                   self.mixed_radiation, self.elm_correct_seb,
                   self.warm_start, self.het_ltype, self.mixed_canopy,
                   self.packed_carry)
        ex = cf.ThreadPoolExecutor(max_workers=1)
        try:
            date = start.copy()
            fut = ex.submit(host_fn, date, window)
            diags_all = []
            for i in range(nsteps // window):
                # H2D of this window; the assembly of the NEXT one starts
                # before the (async) scan dispatch returns control
                payload = put(fut.result())
                date = date.copy()
                date.increment_seconds(int(self.dtime) * window)
                if (i + 1) * window < nsteps:
                    fut = ex.submit(host_fn, date, window)
                if series:
                    ser, steps, (phen_uniq, phen_steps), aero_uniq = \
                        payload
                    self.state, d = _jitted_scan_series(
                        *statics, self.snicar, self.params, self.psnveg,
                        self.albveg, self.state, ser, steps, phen_uniq,
                        phen_steps, aero_uniq)
                else:
                    forc, phen = payload
                    self.state, d = _jitted_scan(
                        *statics, self.snicar, self.params, self.psnveg,
                        self.albveg, self.state, forc, phen)
                diags_all.append(d)
                if callback is not None:
                    callback(date, self.state, d)
        finally:
            ex.shutdown(wait=False)
        return jax.tree.map(lambda *xs: jnp.concatenate(xs), *diags_all)
