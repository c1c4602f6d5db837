"""State pytrees and host-side data managers (forcing, phenology, params).

TPU-native replacement for the reference's data layer
(``/root/reference/src/data``): the ~150-view ``ELMState`` becomes a small
set of NamedTuple pytrees grouped by lifetime, and the NetCDF managers
become host-side readers feeding device arrays.
"""
