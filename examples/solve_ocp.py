"""End-to-end driver: the canonical smooth VGP (ocp_2d_ex1.xml).

The TPU-native analog of the reference's etol_psopt_example1: load the XML
config, transcribe, solve with the batched AL-SQP, print the score, save
state/control CSVs.

    python examples/solve_ocp.py [path/to/config.xml]
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


import jax.numpy as jnp
import numpy as np

from etol_tpu.core import trajectory
from etol_tpu.models import canonical_ocp_2d
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.core.types import Status


def main():
    xml = sys.argv[1] if len(sys.argv) > 1 else None
    vgp, nlp = canonical_ocp_2d(xml)
    data, dims = vgp.to_device()

    cfg = SolverConfig()
    t0 = time.time()
    res = solve(nlp, cfg, data)
    res.z.block_until_ready()
    t_first = time.time() - t0
    t0 = time.time()
    res = solve(nlp, cfg, data)
    res.z.block_until_ready()
    t_warm = time.time() - t0

    X, U = nlp.unpack(res.z)
    ts = np.arange(dims.nodes) * vgp.dt

    print("\n!!!!!!!!!!!!!!!!!Results!!!!!!!!!!!!!!!!!")
    print(f"Status:\t\t\t{Status(int(res.status)).name}")
    print(f"Minimization Score:\t{float(res.obj):.6f}")
    print(f"Constraint viol (eq/in):\t{float(res.viol_eq):.2e} "
          f"{float(res.viol_in):.2e}")
    print(f"Iterations (outer/inner):\t{int(res.outer_iters)}/"
          f"{int(res.inner_iters)}")
    print(f"Solve time: first={t_first:.2f}s (incl. compile) "
          f"warm={t_warm*1e3:.1f}ms")
    fx = trajectory.save((jnp.asarray(ts), X), "state_etol_tpu.csv")
    fu = trajectory.save((jnp.asarray(ts), U), "control_etol_tpu.csv")
    print(f"State variables saved in {fx}")
    print(f"Control variables saved in {fu}")
    print("x0 =", np.asarray(X[0]), " xN =", np.asarray(X[-1]),
          " goal =", np.asarray(data.xf))


if __name__ == "__main__":
    main()
