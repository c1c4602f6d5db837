"""SNICAR optics + snow-aging table readers (NetCDF).

Rebuild of ``/root/reference/src/data/snicar_data.h`` /
``snicar_data_impl.hh``: loads the 5-band Mie tables from
``snicar_optics_5bnd*.nc`` and the aging tables from
``snicar_drdt_bst*.nc``.  The text-fixture loader lives in
``elmkernels_tpu.data.params.load_snicar_from_text``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from elmkernels_tpu.data.netcdf_io import open_nc
from elmkernels_tpu.physics.snow_snicar import SnicarTables

_VAR_MAP = {
    # our name -> NetCDF variable name (reference snicar_data_impl.hh)
    "ss_alb_oc1": "ss_alb_oc1", "asm_prm_oc1": "asm_prm_oc1",
    "ext_cff_mss_oc1": "ext_cff_mss_oc1",
    "ss_alb_oc2": "ss_alb_oc2", "asm_prm_oc2": "asm_prm_oc2",
    "ext_cff_mss_oc2": "ext_cff_mss_oc2",
    "ss_alb_dst1": "ss_alb_dst1", "asm_prm_dst1": "asm_prm_dst1",
    "ext_cff_mss_dst1": "ext_cff_mss_dst1",
    "ss_alb_dst2": "ss_alb_dst2", "asm_prm_dst2": "asm_prm_dst2",
    "ext_cff_mss_dst2": "ext_cff_mss_dst2",
    "ss_alb_dst3": "ss_alb_dst3", "asm_prm_dst3": "asm_prm_dst3",
    "ext_cff_mss_dst3": "ext_cff_mss_dst3",
    "ss_alb_dst4": "ss_alb_dst4", "asm_prm_dst4": "asm_prm_dst4",
    "ext_cff_mss_dst4": "ext_cff_mss_dst4",
    "ss_alb_snw_drc": "ss_alb_ice_drc", "asm_prm_snw_drc": "asm_prm_ice_drc",
    "ext_cff_mss_snw_drc": "ext_cff_mss_ice_drc",
    "ss_alb_snw_dfs": "ss_alb_ice_dfs", "asm_prm_snw_dfs": "asm_prm_ice_dfs",
    "ext_cff_mss_snw_dfs": "ext_cff_mss_ice_dfs",
    "ss_alb_bc1": "ss_alb_bcint", "asm_prm_bc1": "asm_prm_bcint",
    "ext_cff_mss_bc1": "ext_cff_mss_bcint",
    "ss_alb_bc2": "ss_alb_bcext", "asm_prm_bc2": "asm_prm_bcext",
    "ext_cff_mss_bc2": "ext_cff_mss_bcext",
    "bcenh": "bcint_enh_mam"}


def read_snicar_data(path: str) -> SnicarTables:
    f = open_nc(path)
    kw = {}
    for ours, theirs in _VAR_MAP.items():
        name = theirs if theirs in f.variables else ours
        kw[ours] = jnp.asarray(np.asarray(f.variables[name][:], np.float64))
    return SnicarTables(**kw)


def read_snowrds_data(path: str):
    """Snow aging tables [11, 31, 8].  Reference: ``read_snowrds_data``."""
    f = open_nc(path)
    return (jnp.asarray(np.asarray(f.variables["tau"][:], np.float64)),
            jnp.asarray(np.asarray(f.variables["kappa"][:], np.float64)),
            jnp.asarray(np.asarray(f.variables["drdsdt0"][:], np.float64)))
