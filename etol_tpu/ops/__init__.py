"""Structured device kernels for the hot paths.

* :mod:`etol_tpu.ops.cyclic_reduction` — block cyclic reduction for the
  collocation KKT system: O(log K) parallel levels instead of the O(K)
  sequential block-Cholesky scan; each level is batched small-matrix
  algebra that vectorizes over nodes (and the problem batch).
* :mod:`etol_tpu.ops.pallas_bt` — Pallas TPU kernel variants of the
  batched block-tridiagonal solve (lane-major layout; built when
  measurements beat the XLA versions).
"""

from .cyclic_reduction import solve as cr_solve

__all__ = ["cr_solve"]
