"""Receding-horizon MPC demo — the reference's incremental re-solve loop
(eGurobi change-flag machinery, eGurobi.cpp:419-453) as zero-retrace warm
re-solves.

    python examples/mpc_demo.py [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax

if os.environ.get("JAX_PLATFORMS"):
    # TPU-image sitecustomize may override jax_platforms via config;
    # re-assert the env var's choice before backends initialize
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import numpy as np

from etol_tpu import TrajectoryOptimizer
from etol_tpu.models import dynamics


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    topt = TrajectoryOptimizer()
    topt.load_configs(
        os.path.join(os.path.dirname(__file__), "configs", "ocp_2d_ex1.xml")
    )
    topt.set_dynamics(dynamics.single_integrator)
    topt.set_objective(lambda x, u, t, d: u[0] ** 2 + u[1] ** 2)
    topt.setup()

    t0 = time.time()
    topt.solve()
    print(f"cold solve: {time.time()-t0:.2f}s (incl. compile), "
          f"score={topt.get_score():.4f}")

    lat = []
    for k in range(steps):
        _, X = topt.get_xtraj()
        x_next = np.asarray(X[1])  # pretend the vehicle advanced one step
        res = topt.mpc_step(x_next)
        lat.append(topt.last_solve_seconds)
        print(
            f"mpc step {k}: x0={np.round(x_next, 3).tolist()} "
            f"score={float(res.obj):.4f} "
            f"iters={int(res.outer_iters)}/{int(res.inner_iters)} "
            f"t={lat[-1]*1e3:.1f}ms"
        )
    print(f"p50 warm re-solve latency: {np.median(lat)*1e3:.2f}ms")


if __name__ == "__main__":
    main()
