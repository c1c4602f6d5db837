"""The model driver: jitted full water+energy step and the host-side
time-loop/model API (TPU-native replacement for the reference's
``driver/kokkos`` layer)."""
