"""Round-5 headline: goal-pulled seed family measurement (VERDICT r4 #1).

Measures, on the bench's exact uas_2d N=50 scattered workload:
  * seed quality (best-rollout end distance to goal) per family mix;
  * the Newton-iteration CDF of the solve under each seed family.

Iteration counts are backend-independent -> CPU here; wall time is
measured on the chip by bench.py / tools/ladder runs afterwards.

Usage: JAX_PLATFORMS=cpu python tools/seed_r5.py [B] [variant ...]
Variants: walk (512 walks, r4 shipped), pulled (walks + pulled mixes),
          only (pure pulled), cand (n_cand sweep).
"""
import dataclasses
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
import jax.numpy as jnp
import numpy as np

from etol_tpu.bench_harness import make_batch
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, shooting


def run(name, nlp, bdata, cfg, walks, pulled, n_cand=8):
    t0 = time.time()

    @jax.jit
    def go(d):
        z0 = jax.vmap(
            lambda dat: shooting.plan_guess(
                nlp, dat, walks, pulled=pulled, n_cand=n_cand
            )
        )(d)
        # seed end-distance to goal (position part)
        K = nlp.dims.nodes
        Z = z0.reshape(-1, K, nlp.dims.node_width)
        enddist = jnp.linalg.norm(
            Z[:, -1, :2] - d.xf[:, :2], axis=-1
        )
        res = al_sqp.solve_batched.__wrapped__(nlp, cfg, d, z0, None)
        return (res.status, res.inner_iters, res.viol_eq, res.viol_in,
                res.obj, enddist)

    st, it, ve, vi, obj, ed = jax.tree.map(np.asarray, go(bdata))
    dtime = time.time() - t0
    solved = (st == 1).mean()
    p50, p90, p99 = np.percentile(np.sort(it), [50, 90, 99])
    d50, d90, dmax = np.percentile(ed, [50, 90, 100])
    print(
        f"{name:34s} solved {solved:.3f} iters p50/p90/p99 "
        f"{p50:4.0f}/{p90:4.0f}/{p99:4.0f} max {it.max():4d} "
        f"seed-dist p50/p90/max {d50:.2f}/{d90:.2f}/{dmax:.2f} "
        f"obj_med {np.median(obj):.3f} maxviol "
        f"{max(ve.max(), vi.max()):.1e} ({dtime:.0f}s)",
        flush=True,
    )


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    variants = set(sys.argv[2:]) or {"walk", "pulled"}
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    bdata = make_batch(nlp, data, B, jax.random.PRNGKey(0))
    from etol_tpu.models.tuned import _TUNED

    ov, _stages = _TUNED["uas_2d"]
    cfg = SolverConfig(kkt_solver="scan", **{
        **ov, "max_total": 400,  # uncapped-ish: measure the true CDF
    })

    if "walk" in variants:
        run("walks512 (r4 shipped)", nlp, bdata, cfg, 512, 0)
    if "pulled" in variants:
        for w, p in ((512, 64), (512, 128), (384, 128), (256, 128),
                     (256, 64)):
            run(f"walks{w}+pulled{p}", nlp, bdata, cfg, w, p)
    if "only" in variants:
        for p in (64, 128, 256):
            run(f"pulled{p} only", nlp, bdata, cfg, 0, p)
    if "cand" in variants:
        for c in (4, 8, 16):
            run(f"walks256+pulled128 cand{c}", nlp, bdata, cfg, 256,
                128, c)


if __name__ == "__main__":
    main()
