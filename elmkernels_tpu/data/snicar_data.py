"""SNICAR optics + snow-aging table readers (NetCDF).

Rebuild of ``/root/reference/src/data/snicar_data.h`` /
``snicar_data_impl.hh``: loads the 5-band Mie tables from
``snicar_optics_5bnd*.nc`` and the aging tables from
``snicar_drdt_bst*.nc``.  The text-fixture loader lives in
``elmkernels_tpu.data.params.load_snicar_from_text``.

Variable names and hyperslab shapes follow the reference's file contract
(``initialize_elm_kokkos.cc:23-60`` maps file variable names onto table
slots; ``snicar_data_impl.hh:55-131`` reads fixed-size hyperslabs
starting at 0 regardless of the file's full extents).  Legacy synthetic
files using the internal slot names are still accepted as a fallback.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from elmkernels_tpu.data.netcdf_io import open_nc
from elmkernels_tpu.physics.snow_snicar import SnicarTables

# table extents (reference snow_snicar.h:27-36)
NUMRAD_SNW = 5          # spectral bands
IDX_MIE_SNW_MX = 1471   # Mie effective-radius bins
N_BC_NCLRDS = 10        # idx_bc_nclrds_max + 1
N_BCINT_ICERDS = 8      # idx_bcint_icerds_max + 1
N_AGING_T = 11          # idx_T_max + 1
N_AGING_TGRD = 31       # idx_Tgrd_max + 1
N_AGING_RHOS = 8        # idx_rhos_max + 1

# our slot name -> (candidate NetCDF variable names, hyperslab shape).
# First candidate is the reference's real file name
# (initialize_elm_kokkos.cc:23-60); the slot name itself is accepted as
# a fallback for synthetic fixtures.
_AER = {"oc1": "ocphil", "oc2": "ocphob", "dst1": "dust01",
        "dst2": "dust02", "dst3": "dust03", "dst4": "dust04"}
_VAR_MAP = {}
for _slot, _fname in _AER.items():
    for _p in ("ss_alb", "asm_prm", "ext_cff_mss"):
        _VAR_MAP[f"{_p}_{_slot}"] = ([f"{_p}_{_fname}", f"{_p}_{_slot}"],
                                     (NUMRAD_SNW,))
for _kind, _fk in (("drc", "drc"), ("dfs", "dfs")):
    for _p in ("ss_alb", "asm_prm", "ext_cff_mss"):
        _VAR_MAP[f"{_p}_snw_{_kind}"] = (
            [f"{_p}_ice_{_fk}", f"{_p}_snw_{_kind}"],
            (NUMRAD_SNW, IDX_MIE_SNW_MX))
# the reference reads BOTH bc1 (within-ice) and bc2 (external) tables
# from the same ``*_bc_mam`` file variables (snicar_data_impl.hh:96-116);
# legacy bcint/bcext names are accepted per-slot.
for _slot, _legacy in (("bc1", "bcint"), ("bc2", "bcext")):
    for _p in ("ss_alb", "asm_prm", "ext_cff_mss"):
        _VAR_MAP[f"{_p}_{_slot}"] = (
            [f"{_p}_bc_mam", f"{_p}_{_legacy}", f"{_p}_{_slot}"],
            (N_BC_NCLRDS, NUMRAD_SNW))
_VAR_MAP["bcenh"] = (["bcint_enh_mam", "bcenh"],
                     (N_BCINT_ICERDS, N_BC_NCLRDS, NUMRAD_SNW))


def _read_slab(f, candidates, shape, path):
    for name in candidates:
        if name in f.variables:
            arr = np.asarray(f.variables[name][:], np.float64)
            if arr.ndim != len(shape):
                raise ValueError(
                    f"{path}:{name}: rank {arr.ndim} != {len(shape)}")
            if any(a < want for a, want in zip(arr.shape, shape)):
                raise ValueError(
                    f"{path}:{name}: shape {arr.shape} smaller than the "
                    f"required hyperslab {shape}")
            # reference reads a start-0 fixed-count hyperslab
            # (snicar_data_impl.hh:65-123), ignoring any extra extent
            return jnp.asarray(arr[tuple(slice(0, s) for s in shape)])
    raise KeyError(f"{path}: none of {candidates} present")


def read_snicar_data(path: str) -> SnicarTables:
    f = open_nc(path)
    kw = {ours: _read_slab(f, names, shape, path)
          for ours, (names, shape) in _VAR_MAP.items()}
    return SnicarTables(**kw)


def read_snowrds_data(path: str):
    """Snow aging tables [11, 31, 8] (tau, kappa, drdsdt0).
    Reference: ``read_snowrds_data`` (snicar_data_impl.hh:134-160)."""
    f = open_nc(path)
    shape = (N_AGING_T, N_AGING_TGRD, N_AGING_RHOS)
    return tuple(
        _read_slab(f, [name], shape, path)
        for name in ("tau", "kappa", "drdsdt0"))
