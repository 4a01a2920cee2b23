"""Per-component microbenchmark of one solver iteration on the bench
problem (B=1024, K=51, w=5): KKT solve variants, residual pass, AL
gradient, Hessian assembly, line-search pass.
Run: python -u tools/micro_r2.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, btridiag
from etol_tpu.solve.al_sqp import _ALFuncs, init_multipliers

B = int(os.environ.get("MICRO_BATCH", "1024"))
NSTEPS = 50


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args, n=20):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        log(f"{name:28s} {dt*1e3:8.3f} ms")
        return dt
    except Exception as e:  # noqa: BLE001 — report and continue
        log(f"{name:28s} FAILED: {str(e).splitlines()[0][:120]}")
        return float("nan")


def main():
    vgp, nlp = uas_2d(nsteps=NSTEPS)
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    K, w = dims.nodes, dims.nx + dims.nu
    cfg = SolverConfig(rho0=316.0)

    rng = np.random.default_rng(0)
    Dm = rng.normal(size=(B, K, w, w)).astype(np.float32)
    Dm = Dm @ Dm.transpose(0, 1, 3, 2) + 10 * np.eye(w, dtype=np.float32)
    Om = (rng.normal(size=(B, K - 1, w, w)) * 0.3).astype(np.float32)
    rm = rng.normal(size=(B, K, w)).astype(np.float32)
    Dm, Om, rm = jnp.asarray(Dm), jnp.asarray(Om), jnp.asarray(rm)

    from etol_tpu.ops import pallas_bt, cyclic_reduction as cr

    for bt in (128, 256, 512):
        if B % bt or pallas_bt._vmem_bytes(K, w, bt) > pallas_bt._VMEM_CAP:
            log(f"pallas bt={bt}: skipped (vmem)")
            continue
        timeit(f"pallas v2 refine=1 bt={bt}",
               jax.jit(lambda D, O, r, b=bt: pallas_bt.solve_lanes(
                   D, O, r, False, 1, b)), Dm, Om, rm)
    timeit("pallas v2 refine=0 bt=256",
           jax.jit(lambda D, O, r: pallas_bt.solve_lanes(
               D, O, r, False, 0, 256)), Dm, Om, rm)
    timeit("cr x2 (double solve)",
           jax.jit(jax.vmap(lambda D, O, r: cr.solve(
               D, O, r + 0 * cr.solve(D, O, r)))), Dm, Om, rm)
    timeit("cr x1", jax.jit(jax.vmap(cr.solve)), Dm, Om, rm)
    timeit("scan x1", jax.jit(jax.vmap(btridiag.solve)), Dm, Om, rm)

    # solver-piece timings via _ALFuncs under vmap
    z0 = jax.vmap(nlp.initial_guess)(bdata)
    lam = init_multipliers(nlp, data)
    lamB = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), lam
    )

    def residuals(d, z):
        F = _ALFuncs(nlp, cfg, d)
        return F.residuals(z.reshape(K, w))

    def al_grad(d, z, l):
        F = _ALFuncs(nlp, cfg, d)
        return F.al_grad(z.reshape(K, w), l[0], l[1], l[2],
                         jnp.float32(316.0))

    def gn(d, z, l):
        F = _ALFuncs(nlp, cfg, d)
        Z = z.reshape(K, w)
        free = jnp.ones_like(Z, bool)
        return F.gn_blocks(Z, l[0], l[1], l[2], jnp.float32(316.0),
                           free, jnp.float32(1e-3))

    def ls24(d, z, l):
        F = _ALFuncs(nlp, cfg, d)
        Z = z.reshape(K, w)
        alphas = 0.5 ** jnp.arange(24, dtype=jnp.float32)
        Zc = jnp.clip(Z[None] + alphas[:, None, None] * 0.01, F.lb, F.ub)
        cd, ce, g = jax.vmap(F.residuals)(Zc)
        cost = jax.vmap(F.cost)(Zc)
        return cd.sum() + ce.sum() + g.sum() + cost.sum()

    timeit("residual pass x1", jax.jit(jax.vmap(residuals)), bdata, z0)
    timeit("al_grad", jax.jit(jax.vmap(al_grad)), bdata, z0, lamB)
    timeit("gn_blocks (hess assembly)", jax.jit(jax.vmap(gn)), bdata, z0,
           lamB)
    timeit("line search 24 cand", jax.jit(jax.vmap(ls24)), bdata, z0,
           lamB)
    log("done")


if __name__ == "__main__":
    main()
