"""etol-tpu: a TPU-native trajectory-optimization framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
Extensible Trajectory Optimization Library (reference: olasanni1/ETOL,
``include/ETOL/TrajectoryOptimizer.hpp``): Vehicle Guidance Problems —
objective, dynamics, state/control bounds, static polygonal and moving
circular exclusion zones — compiled to one batched direct-collocation
NLP and solved by a native augmented-Lagrangian SQP with block-tridiagonal
KKT factorizations, ``vmap``-ed over thousands of scenarios and sharded
over TPU meshes with ``pjit``/``shard_map``.

Public surface (reference parity map in SURVEY.md §2):

* :class:`etol_tpu.TrajectoryOptimizer` — problem container + solve facade
  (``setup()/solve()/debug()/close()``) mirroring the reference's abstract
  core, with the single native batched solver replacing its six plugins.
* :mod:`etol_tpu.core` — problem spec pytrees, XML I/O, geometry.
* :mod:`etol_tpu.transcribe` — collocation defects, obstacle constraints,
  NLP assembly.
* :mod:`etol_tpu.solve` — the batched solver.
* :mod:`etol_tpu.models` — dynamics/problem library (integrators, unicycle
  UAS, 3D point mass, fixed-wing).
* :mod:`etol_tpu.parallel` — device meshes and sharded solves.
* :mod:`etol_tpu.viz` — plotting/animation (gnuplot/ffmpeg parity via
  matplotlib).
"""

from .core.problem import VGP, VGPData, Track, stack, batch_tile
from .core.types import Dims, ParamConfig, Status, VarType
from .core.xml_io import load_configs, save_configs
from .transcribe.nlp import NLP

__version__ = "0.1.0"

__all__ = [
    "VGP",
    "VGPData",
    "Track",
    "Dims",
    "ParamConfig",
    "Status",
    "VarType",
    "NLP",
    "load_configs",
    "save_configs",
    "stack",
    "batch_tile",
    "TrajectoryOptimizer",
]


def __getattr__(name):
    # Lazy: the facade pulls in the solver stack; keep bare core imports fast.
    if name == "TrajectoryOptimizer":
        from .optimizer import TrajectoryOptimizer

        return TrajectoryOptimizer
    raise AttributeError(f"module 'etol_tpu' has no attribute {name!r}")
