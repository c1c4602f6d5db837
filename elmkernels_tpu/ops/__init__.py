"""Custom TPU kernels (Pallas) for the framework's hot paths.

Currently empty: the round-2/3 profiling showed the production solver
paths are pure-XLA and that a VMEM-resident Pallas ci solver could only
serve the full-f32 configuration (Mosaic has no f64), not the
production mixed-f64 step, while failing to legalize on TPU v5e — so
the experimental kernel was removed (VERDICT r2 item 5: no code path
that cannot run on the hardware it targets).  The pure-JAX solvers in
``physics/`` are the validated production path for both dtypes.
"""
