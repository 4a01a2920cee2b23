"""Device meshes and sharded solves.

The reference has no parallelism of any kind (SURVEY.md §2a — one process,
one problem, one thread). The TPU build's axes:

* **batch** — thousands of VGPs data-parallel over chips (`pjit` with a
  NamedSharding on the leading axis; embarrassingly parallel, collectives
  only for reductions the caller asks for).
* **horizon** — the time axis (sequence-parallel analog): collocation
  nodes sharded over chips, defect coupling at shard boundaries satisfied
  by a one-node halo exchange (`ppermute` over ICI), reductions by `psum`.
"""

from .mesh import make_mesh, shard_batch, solve_sharded
from .horizon import sharded_defects, sharded_al_pieces

__all__ = [
    "make_mesh",
    "shard_batch",
    "solve_sharded",
    "sharded_defects",
    "sharded_al_pieces",
]
