"""End-to-end driver: 3D point mass dodging moving spheres
(BASELINE config 3), with plot artifacts.

    python examples/solve_3d.py
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

from etol_tpu.core.types import Status
from etol_tpu.models import point_mass_3d
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.viz import plot_xy_with_zones, animate2d


def main():
    vgp, nlp = point_mass_3d()
    data, dims = vgp.to_device()
    t0 = time.time()
    res = solve(nlp, SolverConfig(), data)
    res.z.block_until_ready()
    X, U = nlp.unpack(res.z)
    ts = jnp.arange(dims.nodes) * vgp.dt
    print(f"Status: {Status(int(res.status)).name}  "
          f"score={float(res.obj):.4f}  "
          f"viol={float(res.viol_eq):.1e}/{float(res.viol_in):.1e}  "
          f"t={time.time()-t0:.1f}s")
    print("xN:", np.asarray(X[-1]), " goal:", np.asarray(data.xf))
    out = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out, exist_ok=True)
    plot_xy_with_zones(
        (ts, X), vgp.obstacles, vgp.tracks,
        save=os.path.join(out, "pm3d_xy.png"),
    )
    gif = animate2d(
        (ts, X), vgp.obstacles, vgp.tracks,
        save=os.path.join(out, "pm3d.gif"), fps=8,
    )
    print(f"artifacts: {out}/pm3d_xy.png, {gif}")


if __name__ == "__main__":
    main()
