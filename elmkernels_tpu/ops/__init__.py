"""Pallas TPU kernels for the framework's hot paths.

Each kernel has a pure-JAX reference implementation elsewhere in the
package (the golden-tested path); the Pallas version is an opt-in,
numerically-equivalent accelerator selected at trace time.  Kernels run
in ``interpret`` mode on CPU for testing.
"""

from elmkernels_tpu.ops.ci_solver import ci_hybrid_solve  # noqa: F401
