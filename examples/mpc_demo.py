"""Receding-horizon MPC demo — the reference's incremental re-solve loop
(eGurobi change-flag machinery, eGurobi.cpp:419-453) as zero-retrace warm
re-solves (installed: ``etol-mpc-demo``).

    python examples/mpc_demo.py [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etol_tpu.cli import mpc_demo

if __name__ == "__main__":
    raise SystemExit(mpc_demo())
