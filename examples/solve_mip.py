"""End-to-end driver: the canonical MILP VGP (mip_2d_ex1.xml), solved
smoothly with multi-start — the TPU-native analog of etol_glpk_example1
(installed: ``etol-solve-mip``).

    python examples/solve_mip.py [path/to/config.xml]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etol_tpu.cli import solve_mip

if __name__ == "__main__":
    raise SystemExit(solve_mip())
