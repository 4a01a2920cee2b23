"""The native batched solver.

One solver replaces the reference's six CPU plugins (eGLPK/eGurobi/eSCIP
MILP transcriptions, ePSOPT/eDymos collocation NLP, eOMPL sampling;
SURVEY.md §2 C4-C9): an augmented-Lagrangian Gauss-Newton SQP over the
direct-collocation NLP, with a projected-Newton inner loop on box bounds
and a block-tridiagonal KKT factorization exploiting the horizon structure.
Everything is fixed-shape and `lax.while_loop`-driven, so the whole solve
jits once and `vmap`s over problem batches.
"""

from .al_sqp import (
    SolverConfig,
    SolveResult,
    solve,
    solve_batched,
    solve_batched_rescue,
    solve_batched_staged,
    solve_multistart,
)
from . import al_sqp, btridiag, planners, shooting, side_branch
from .branch_bound import MIPResult, integer_mask, solve_milp
from .options import nlp_config
from .planners import PLANNERS
from .refine import solve_refined

__all__ = [
    "SolverConfig",
    "SolveResult",
    "MIPResult",
    "solve",
    "solve_batched",
    "solve_batched_rescue",
    "solve_batched_staged",
    "solve_multistart",
    "solve_refined",
    "solve_milp",
    "integer_mask",
    "nlp_config",
    "al_sqp",
    "btridiag",
    "planners",
    "PLANNERS",
    "shooting",
    "side_branch",
]
