// Minimal stub of the NetCDF C API, sufficient to *compile* the reference's
// header-only readers (read_netcdf.hh) for golden-fixture generation.  The
// generators never call NetCDF at runtime (fixtures come from text files),
// so these stubs simply abort if ever reached.
#pragma once

#include <cstdlib>

#define NC_NOWRITE 0
#define NC_WRITE 1
#define NC_DOUBLE 6
#define NC_MAX_VAR_DIMS 1024

typedef int nc_type;

inline const char* nc_strerror(int) { return "netcdf stub"; }
inline int nc_open(const char*, int, int*) { std::abort(); }
inline int nc_create(const char*, int, int*) { std::abort(); }
inline int nc_close(int) { std::abort(); }
inline int nc_inq_dimid(int, const char*, int*) { std::abort(); }
inline int nc_inq_dimlen(int, int, std::size_t*) { std::abort(); }
inline int nc_inq_varid(int, const char*, int*) { std::abort(); }
inline int nc_inq_var(int, int, char*, nc_type*, int*, int*, int*) { std::abort(); }
inline int nc_inq_vardimid(int, int, int*) { std::abort(); }
inline int nc_get_att(int, int, const char*, void*) { std::abort(); }
inline int nc_get_vara_double(int, int, const std::size_t*, const std::size_t*, double*) { std::abort(); }
inline int nc_get_vara_int(int, int, const std::size_t*, const std::size_t*, int*) { std::abort(); }
inline int nc_get_vara_text(int, int, const std::size_t*, const std::size_t*, char*) { std::abort(); }
inline int nc_def_dim(int, const char*, std::size_t, int*) { std::abort(); }
inline int nc_def_var(int, const char*, nc_type, int, const int*, int*) { std::abort(); }
inline int nc_enddef(int) { std::abort(); }
inline int nc_put_vara_double(int, int, const std::size_t*, const std::size_t*, const double*) { std::abort(); }
