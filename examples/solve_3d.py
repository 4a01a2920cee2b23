"""End-to-end driver: 3D point mass dodging moving spheres
(BASELINE config 3), with plot artifacts (installed: ``etol-solve-3d``).

    python examples/solve_3d.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etol_tpu.cli import solve_3d

if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    raise SystemExit(solve_3d(sys.argv[1:] or [out]))
