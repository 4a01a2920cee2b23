"""End-to-end driver: the canonical smooth VGP (ocp_2d_ex1.xml) — the
TPU-native analog of etol_psopt_example1 (installed: ``etol-solve-ocp``).

    python examples/solve_ocp.py [path/to/config.xml]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etol_tpu.cli import solve_ocp

if __name__ == "__main__":
    raise SystemExit(solve_ocp())
