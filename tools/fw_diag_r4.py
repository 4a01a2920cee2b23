"""Round-4 fixed-wing convergence diagnosis (VERDICT r3 do #1).

Measures the Newton-iteration CDF of the fixed-wing N=100 workload
(BASELINE config 4) under candidate solver/seed configurations, on CPU
(iteration counts are backend-independent; wall time is measured on the
chip by tools/bench_scaling.py afterwards).

Usage: JAX_PLATFORMS=cpu python tools/fw_diag_r4.py [B] [variant ...]
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

from etol_tpu import batch_tile
from etol_tpu.models import fixed_wing_3dof
from etol_tpu.solve import SolverConfig, al_sqp, shooting


def scatter_x0(data, B, scale, dims_free, key):
    bdata = batch_tile(data, B)
    nx = bdata.x0.shape[-1]
    d = jax.random.uniform(
        key, (B, nx), minval=-scale, maxval=scale
    ).astype(jnp.float32)
    mask = jnp.zeros((nx,)).at[jnp.asarray(dims_free)].set(1.0)
    return dataclasses.replace(bdata, x0=bdata.x0 + d * mask)


def run(name, nlp, bdata, cfg, z0=None):
    t0 = time.time()

    @jax.jit
    def go(d, z):
        res = al_sqp.solve_batched.__wrapped__(nlp, cfg, d, z, None)
        return (res.status, res.inner_iters, res.viol_eq, res.viol_in,
                res.obj)

    st, it, ve, vi, obj = jax.tree.map(np.asarray, go(bdata, z0))
    dtime = time.time() - t0
    solved = (st == 1).mean()
    its = np.sort(it)
    p50, p90, p99 = np.percentile(its, [50, 90, 99])
    print(
        f"{name:40s} solved {solved:.3f} iters p50/p90/p99 "
        f"{p50:5.0f}/{p90:5.0f}/{p99:5.0f} maxviol "
        f"{max(ve.max(), vi.max()):.1e} obj_med {np.median(obj):.4f} "
        f"({dtime:.0f}s)",
        flush=True,
    )
    return solved, p50, p99


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    variants = set(sys.argv[2:]) or {"base"}
    vgp, nlp = fixed_wing_3dof()
    data, dims = vgp.to_device()
    bdata = scatter_x0(data, B, 0.05, [0, 1], jax.random.PRNGKey(2))
    base = SolverConfig(
        max_outer=64, rho0=10.0, lm_rule="ratio",
        round_viol_patience=8, max_total=2000,
    )

    if "base" in variants:
        run("baseline rho10", nlp, bdata, base)
    if "rho" in variants:
        for r in (31.6, 100.0, 316.0, 1000.0):
            run(f"rho0={r}", nlp, bdata,
                dataclasses.replace(base, rho0=r))
    if "shoot" in variants:
        z0 = jax.jit(
            lambda d: jax.vmap(
                lambda dat: shooting.plan_guess(nlp, dat, 512)
            )(d)
        )(bdata)
        run("shooting seeds 512", nlp, bdata, base, z0)
    if "growth" in variants:
        for g in (1.5, 2.0, 3.16, 5.0):
            run(f"rho_growth={g}", nlp, bdata,
                dataclasses.replace(base, rho_growth=g))
    if "patience" in variants:
        for p in (2, 4, 16):
            run(f"patience={p}", nlp, bdata,
                dataclasses.replace(base, round_viol_patience=p))
    if "hessian" in variants:
        for h in ("gn", "full"):
            run(f"hessian={h}", nlp, bdata,
                dataclasses.replace(base, hessian=h))
    if "ls" in variants:
        for g in (8, 12, 16):
            run(f"rho316 ls_grid={g}", nlp, bdata,
                dataclasses.replace(base, rho0=316.0, ls_grid=g,
                                    ls_backtracks=g))
    if "radau" in variants:
        nlp_r = dataclasses.replace(nlp, scheme="radau")
        for r in (10.0, 316.0, 1000.0):
            run(f"radau rho0={r}", nlp_r, bdata,
                dataclasses.replace(base, rho0=r))
    if "best" in variants:
        for r in (316.0, 1000.0):
            for p in (4, 8):
                run(f"rho0={r} patience={p}", nlp, bdata,
                    dataclasses.replace(
                        base, rho0=r, round_viol_patience=p))


if __name__ == "__main__":
    main()
