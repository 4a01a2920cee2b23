"""End-to-end driver: composed exact MILP — BINARY 'boost' params and
obstacle disjunctions resolved by ONE certified branch-and-bound tree
(the analog of etol_glpk_example1's single GLPK model holding both
binary families; installed: ``etol-solve-exact``).

    python examples/solve_exact_composed.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etol_tpu.cli import solve_exact_composed

if __name__ == "__main__":
    raise SystemExit(solve_exact_composed())
