"""Round-5: exact B&B cost ON THE TPU (VERDICT r4 do #4).

The reference's exact MILP solve is its production path
(eGLPK.cpp:64-77); r4 published only the CPU cost (~7.5 s cold for
`etol-solve-mip --exact`). This tool times side_branch.solve_exact on
the chip for the two shipped exact workloads — mip_2d_ex1 (obstacle
disjunctions on the canonical MILP) and the composed demo (obstacle +
BINARY param in one tree) — cold (first call, incl. compile through
the tunnel's remote compile helper; the persistent cache makes repeat
runs honest-warm) and warm (same process, second call), sweeping the
frontier wave width {8, 16, 32}: device waves are nearly free, so the
host heapq loop should feed wider batches.

Usage: python tools/exact_tpu_r5.py [wave ...]
"""
import os
import sys
import time

import jax as _jax

if os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

from etol_tpu.core.types import Status
from etol_tpu.models import composed_exact_demo
from etol_tpu.solve import SolverConfig, integer_mask, side_branch


def mip_problem():
    import numpy as np

    from etol_tpu.models import canonical_mip_2d

    vgp, nlp = canonical_mip_2d()
    data, dims = vgp.to_device()
    return "mip_2d_ex1", vgp, nlp, data


def composed_problem():
    vgp, nlp = composed_exact_demo()
    data, dims = vgp.to_device()
    return "composed_demo", vgp, nlp, data


def run(name, vgp, nlp, data, wave, repeat=2):
    icols = integer_mask(vgp)
    times = []
    res = None
    for i in range(repeat):
        t0 = time.time()
        res = side_branch.solve_exact(
            nlp, SolverConfig(), data,
            int_cols=icols if icols.any() else None,
            wave=wave, max_nodes=512, convex_relaxation=True,
        )
        times.append(time.time() - t0)
    print(
        f"{name:14s} wave={wave:3d} status "
        f"{Status(int(res.status)).name:8s} certified={res.certified} "
        f"obj {res.obj:.4f} gap {res.gap:.1e} nodes {res.nodes_solved} "
        f"waves {res.waves}  cold {times[0]:6.1f}s  warm "
        f"{min(times[1:]) if len(times) > 1 else float('nan'):6.1f}s",
        flush=True,
    )
    return times


def main():
    waves = [int(w) for w in sys.argv[1:]] or [8, 16, 32]
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    for maker in (mip_problem, composed_problem):
        name, vgp, nlp, data = maker()
        for w in waves:
            run(name, vgp, nlp, data, w)


if __name__ == "__main__":
    main()
