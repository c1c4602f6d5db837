#!/usr/bin/env python3
"""Print the albedo PFT parameters for one vtype from clm_params NetCDF,
in the order surface_albedo_gen expects on its command line:
rholvis rholnir rhosvis rhosnir taulvis taulnir tausvis tausnir xl
"""
import sys

from scipy.io import netcdf_file

path = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/test/data/clm_params_c180524.nc"
vtype = int(sys.argv[2]) if len(sys.argv) > 2 else 12

f = netcdf_file(path, mmap=False)
names = ["rholvis", "rholnir", "rhosvis", "rhosnir",
         "taulvis", "taulnir", "tausvis", "tausnir", "xl"]
print(" ".join(repr(float(f.variables[n][vtype])) for n in names))
