"""End-to-end driver: the canonical MILP VGP (mip_2d_ex1.xml), solved
smoothly with multi-start — the TPU-native analog of etol_glpk_example1
(min sum |u| with abs-epigraph controls; the big-M obstacle disjunctions
become edge ellipses, branch-and-bound becomes the multi-start batch).

    python examples/solve_mip.py [path/to/config.xml]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax

if os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from etol_tpu.core import trajectory
from etol_tpu.core.types import Status
from etol_tpu.models import canonical_mip_2d
from etol_tpu.solve import SolverConfig, solve_multistart


def main():
    xml = sys.argv[1] if len(sys.argv) > 1 else None
    vgp, nlp = canonical_mip_2d(xml)
    vgp.print_configs()
    data, dims = vgp.to_device()

    t0 = time.time()
    res = solve_multistart(nlp, SolverConfig(), data, 8)
    res.z.block_until_ready()

    X, U = nlp.unpack(res.z)
    ts = np.arange(dims.nodes) * vgp.dt
    print("\n!!!!!!!!!!!!!!!!!Results!!!!!!!!!!!!!!!!!")
    print(f"Status:\t\t\t{Status(int(res.status)).name}")
    print(f"Minimization Score:\t{float(res.obj):.6f}")
    print(f"Constraint viol:\t{float(res.viol_eq):.2e} "
          f"{float(res.viol_in):.2e}")
    print(f"Solve time (incl. compile): {time.time()-t0:.1f}s")
    fx = trajectory.save((jnp.asarray(ts), X), "state_mip_etol_tpu.csv")
    fu = trajectory.save((jnp.asarray(ts), U), "control_mip_etol_tpu.csv")
    print(f"State variables saved in {fx}")
    print(f"Control variables saved in {fu}")


if __name__ == "__main__":
    main()
