"""I/O: solver-state checkpointing (plus CSV/XML in :mod:`etol_tpu.core`).

The reference has no checkpoint/resume (SURVEY.md §5) — its nearest
analogs are XML config save/load and warm-start state retained inside
Gurobi/SCIP between MPC re-solves. Here the full solver state (iterates,
multipliers, penalties) is a pytree, so long batched runs checkpoint and
resume exactly.
"""

from .checkpoint import load_checkpoint, save_checkpoint
from .lp_export import write_lp
from .lp_io import LPModel, LPSolution, read_lp, solve_lp, write_sol

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "write_lp",
    "LPModel",
    "LPSolution",
    "read_lp",
    "solve_lp",
    "write_sol",
]
