#!/usr/bin/env python3
"""Print the 27 PFTDataPSN parameters for one vtype from clm_params NetCDF
in the order canopy_fluxes_gen expects on its command line (matching
reference get_pft_psn, pft_data_impl.hh:60-96; tc_stress uses index 0)."""
import sys

from scipy.io import netcdf_file

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/test/data/clm_params_c180524.nc"
vtype = int(sys.argv[2]) if len(sys.argv) > 2 else 12

f = netcdf_file(path, mmap=False)
names = ["fnr", "act25", "kcha", "koha", "cpha", "vcmaxha", "jmaxha",
         "tpuha", "lmrha", "vcmaxhd", "jmaxhd", "tpuhd", "lmrhd", "lmrse",
         "qe", "theta_cj", "bbbopt", "mbbopt", "c3psn", "slatop", "leafcn",
         "flnr", "fnitr", "dleaf", "smpso", "smpsc"]
vals = [float(f.variables[n][vtype]) for n in names]
vals.append(float(f.variables["tc_stress"][0]))
print(" ".join(repr(v) for v in vals))
