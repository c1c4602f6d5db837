"""Runtime configuration.

The reference's configuration is static and scattered across three tiers
(CMake options, ``constexpr`` ELMconfig/ELMdims in ``elm_constants.h:10-15``,
and values hardwired in ``elm_kokkos_interface.cc:40-99`` /
``kokkos_driver.cc:37-42``); it has no CLI/flag/file system.  Here all
run-level knobs live in one dataclass, loadable from JSON/YAML and
overridable from the command line.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any

from elmkernels_tpu.driver.model import (DEFAULT_PFT_PATH,
                                         DEFAULT_SNICAR_PATH)


@dataclasses.dataclass
class RunConfig:
    """One simulation run (the reference's ELMInterface ctor + main())."""
    # problem size / time stepping (kokkos_driver.cc:37-42)
    ncol: int = 1
    dtime: float = 1800.0
    nsteps: int = 100
    start_year: int = 1985
    start_doy: int = 181          # 0-based day of year (no-leap calendar)
    start_sec: int = 43200
    # surface (elm_kokkos_interface.cc:58-99)
    vtype: int = 12
    lat_deg: float = 71.323
    lon_deg: float = 203.3886
    # input data (INPUT_DATA_DIR macro + file names in the interface ctor)
    pft_path: str = DEFAULT_PFT_PATH
    snicar_path: str = DEFAULT_SNICAR_PATH
    # snicar_drdt_bst*.nc snow-aging tables; required when
    # elm_correct_snow_aging is set
    snow_aging_path: str | None = None
    # surfdata NetCDF driving a heterogeneous per-column grid (lat/lon,
    # soil color/texture, dominant PFT) via Model.from_surfdata; the
    # scalar vtype/lat_deg/lon_deg fields then only serve as fallbacks
    surfdata_path: str | None = None
    # month-per-file NetCDF forcing basename (reference read_input.hh
    # "basenameYYYY-MM.nc"); None -> synthetic analytic forcing
    forcing_basename: str | None = None
    # surfdata NetCDF with monthly phenology; None -> synthetic
    phenology_path: str | None = None
    # numerics
    f64: bool = True
    # ELM-proper snow grain aging (fixes the reference's double-clamp
    # quirk, snow_hydrology_impl.hh:216-222); False = reference-exact
    elm_correct_snow_aging: bool = False
    # ELM-proper SEB linearization (fixes the reference's dropped factor
    # in eflx_soil_grnd, surface_fluxes_impl.hh:182); False = ref-exact
    elm_correct_seb: bool = False
    # f32 SNICAR + two-stream inside the f64 step: the production
    # default (drift-tested, tests/test_mixed_radiation.py); False = the
    # reference-exact pure-f64 radiative solvers (errsol 1e-13)
    mixed_radiation: bool = True
    # warm-start the canopy stability / ci solvers from the previous
    # step's converged obu/ci (production default, promoted r4 on
    # season-scale drift evidence; False = reference-exact cold-start
    # iteration sequences)
    warm_start: bool = True
    # f32 canopy stability-loop interior with f64 prognostic handoff
    # (production default, promoted r4; False = f64 loop interior)
    mixed_canopy: bool = True
    # dtype-fused scan-carry buffers (opt-in perf mode; see
    # Model.packed_carry / utils/packing.py)
    packed_carry: bool = False
    # pin the JAX backend (e.g. "cpu"); None = default device. The axon
    # site config overrides the JAX_PLATFORMS env var, so this must be
    # applied via jax.config after import.
    platform: str | None = None
    # conservation guard thresholds (None disables a check)
    errh2o_max: float | None = 0.1    # mm/step
    errh2osno_max: float | None = 1e-6
    # default bounds the mixed-radiation contract (errsol ~1e-6 W/m2);
    # a pure-f64 run (mixed_radiation=False) closes to 1e-13
    errsol_max: float | None = 1e-5
    # outputs
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0         # steps; 0 = only explicit saves
    metrics_path: str | None = None   # JSONL per-step metrics
    # NetCDF history output (utils/history.py): file stem, flush window,
    # comma-separated diagnostic/state field names
    history_path: str | None = None
    history_every: int = 48
    history_fields: str = "t_grnd,eflx_sh_tot,eflx_lh_tot,fsa,h2osno"

    def make_model(self):
        from elmkernels_tpu.driver.model import Model
        kw: dict[str, Any] = dict(dtime=self.dtime,
                                  pft_path=self.pft_path,
                                  snicar_path=self.snicar_path,
                                  snow_aging_path=self.snow_aging_path,
                                  forcing_basename=self.forcing_basename,
                                  phenology_path=self.phenology_path,
                                  elm_correct_snow_aging=(
                                      self.elm_correct_snow_aging),
                                  elm_correct_seb=self.elm_correct_seb,
                                  mixed_radiation=self.mixed_radiation,
                                  warm_start=self.warm_start,
                                  mixed_canopy=self.mixed_canopy,
                                  packed_carry=self.packed_carry)
        if self.surfdata_path is not None:
            return Model.from_surfdata(self.surfdata_path, self.ncol, **kw)
        return Model(ncol=self.ncol, vtype=self.vtype,
                     lat_deg=self.lat_deg, lon_deg=self.lon_deg, **kw)

    def start_date(self):
        from elmkernels_tpu.utils.dates import Date
        return Date(self.start_year, self.start_doy, self.start_sec)

    # ---- serialization -----------------------------------------------------
    @classmethod
    def from_file(cls, path: str | pathlib.Path) -> "RunConfig":
        """Load from JSON or YAML (by extension); unknown keys error."""
        path = pathlib.Path(path)
        text = path.read_text()
        if path.suffix in (".yaml", ".yml"):
            import yaml
            data = yaml.safe_load(text)
        else:
            data = json.loads(text)
        return cls.from_dict(data)

    @classmethod
    def from_dict(cls, data: dict) -> "RunConfig":
        fields = {f.name: f for f in dataclasses.fields(cls)}
        unknown = set(data) - set(fields)
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}; "
                             f"known: {sorted(fields)}")
        for k, v in data.items():
            tname = fields[k].type
            tname = tname if isinstance(tname, str) else tname.__name__
            base = tname.split("|")[0].strip()
            ok = {"int": lambda x: isinstance(x, int)
                  and not isinstance(x, bool),
                  "float": lambda x: isinstance(x, (int, float))
                  and not isinstance(x, bool),
                  "bool": lambda x: isinstance(x, bool),
                  "str": lambda x: isinstance(x, str)}.get(base)
            if v is not None and ok is not None and not ok(v):
                raise ValueError(
                    f"config key {k!r} expects {tname}, got {v!r}")
        return cls(**data)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str | pathlib.Path) -> None:
        pathlib.Path(path).write_text(json.dumps(self.to_dict(), indent=2)
                                      + "\n")

    # ---- CLI ----------------------------------------------------------------
    @classmethod
    def add_cli_args(cls, parser) -> None:
        """Register every field as ``--name`` (bool fields take 0/1)."""
        for f in dataclasses.fields(cls):
            typ = {int: int, float: float, str: str}.get(f.type if
                                                         isinstance(f.type,
                                                                    type)
                                                         else None)
            # dataclass field types are strings under future annotations
            tname = f.type if isinstance(f.type, str) else f.type.__name__
            if tname.startswith("bool"):
                conv = lambda s: s not in ("0", "false", "False")
            elif tname.startswith("int"):
                conv = int
            elif tname.startswith("float"):
                conv = float
            else:
                conv = str
            parser.add_argument(f"--{f.name}", type=conv, default=None,
                                help=f"(default: {f.default})")

    @classmethod
    def from_cli(cls, argv=None) -> "RunConfig":
        """``--config file.json`` base + per-field overrides."""
        import argparse
        parser = argparse.ArgumentParser()
        parser.add_argument("--config", default=None,
                            help="JSON/YAML config file")
        cls.add_cli_args(parser)
        ns = parser.parse_args(argv)
        cfg = cls.from_file(ns.config) if ns.config else cls()
        for f in dataclasses.fields(cls):
            v = getattr(ns, f.name)
            if v is not None:
                setattr(cfg, f.name, v)
        return cfg
