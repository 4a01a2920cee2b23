"""Per-component microbenchmark of one solver iteration on the bench
problem (B=1024, K=51, w=5): KKT solve variants, residual pass, AL
gradient, Hessian assembly, line-search pass.

Timing discipline for the tunneled axon backend: each piece is run
``REPS`` times inside ONE jitted fori_loop (data-dependency chained), so
per-dispatch overhead (~4.5 ms RTT) amortizes away; the scalar host pull
is the completion barrier (block_until_ready acks enqueue only).

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
from etol_tpu.solve import SolverConfig, btridiag
from etol_tpu.solve.al_sqp import _ALFuncs, init_multipliers

B = int(os.environ.get("MICRO_BATCH", "1024"))
REPS = int(os.environ.get("MICRO_REPS", "50"))
NSTEPS = 50


def log(*a):
    print(*a, flush=True)


def timeit(name, fn, *args):
    """fn(*args) -> pytree. Times REPS in-graph repetitions of fn with a
    perturbation chain so XLA cannot CSE them away."""
    def looped(*a):
        def body(i, carry):
            eps, acc = carry
            # perturb the FIRST array arg by a carry-dependent epsilon,
            # forcing a fresh evaluation each iteration
            a2 = list(a)
            a2[0] = a2[0] + eps
            out = fn(*a2)
            s = sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)
            )
            return (s * 1e-30, acc + s)

        _, acc = jax.lax.fori_loop(
            0, REPS, body, (jnp.float32(0.0), jnp.float32(0.0))
        )
        return acc

    try:
        g = jax.jit(looped)
        float(g(*args))  # compile + 1st
        t0 = time.time()
        float(g(*args))
        dt = (time.time() - t0) / REPS
        log(f"{name:28s} {dt*1e3:8.3f} ms")
        return dt
    except Exception as e:  # noqa: BLE001 — report and continue
        log(f"{name:28s} FAILED: {str(e).splitlines()[0][:120]}")
        return float("nan")


def main():
    vgp, nlp = uas_2d(nsteps=NSTEPS)
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    K, w = dims.nodes, dims.node_width
    cfg = SolverConfig(rho0=316.0)

    rng = np.random.default_rng(0)
    Dm = rng.normal(size=(B, K, w, w)).astype(np.float32)
    Dm = Dm @ Dm.transpose(0, 1, 3, 2) + 10 * np.eye(w, dtype=np.float32)
    Om = (rng.normal(size=(B, K - 1, w, w)) * 0.3).astype(np.float32)
    rm = rng.normal(size=(B, K, w)).astype(np.float32)
    Dm, Om, rm = jnp.asarray(Dm), jnp.asarray(Om), jnp.asarray(rm)

    from etol_tpu.ops import pallas_bt, cyclic_reduction as cr

    for bt, refine in ((128, 1), (128, 0), (256, 0)):
        if B % bt or pallas_bt._vmem_bytes(K, w, bt) > pallas_bt._VMEM_CAP:
            log(f"pallas bt={bt}: skipped (vmem)")
            continue
        timeit(f"pallas refine={refine} bt={bt}",
               lambda D, O, r, b=bt, rf=refine: pallas_bt.solve_lanes(
                   D, O, r, False, rf, b), Dm, Om, rm)

    def r0_xla_refine(D, O, r):
        x = pallas_bt.solve_lanes(D, O, r, False, 0, 128)
        res = r - jax.vmap(btridiag.matvec)(D, O, x)
        return x + pallas_bt.solve_lanes(D, O, res, False, 0, 128)

    timeit("pallas r0 x2 + xla matvec", r0_xla_refine, Dm, Om, rm)
    timeit("cr x1", jax.vmap(cr.solve), Dm, Om, rm)
    timeit("scan x1", jax.vmap(btridiag.solve), Dm, Om, rm)

    # solver-piece timings via _ALFuncs under vmap
    z0 = jax.vmap(nlp.initial_guess)(bdata)
    lam = init_multipliers(nlp, data)
    lamB = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), lam
    )

    def residuals(z, d):
        F = _ALFuncs(nlp, cfg, d)
        return F.residuals(z.reshape(K, w))

    def al_grad(z, d, l):
        F = _ALFuncs(nlp, cfg, d)
        return F.al_grad(z.reshape(K, w), l[0], l[1], l[2],
                         jnp.float32(316.0))

    def gn(z, d, l):
        F = _ALFuncs(nlp, cfg, d)
        Z = z.reshape(K, w)
        free = jnp.ones_like(Z, bool)
        return F.gn_blocks(Z, l[0], l[1], l[2], jnp.float32(316.0),
                           free, jnp.float32(1e-3))

    def direction(z, d, l):
        F = _ALFuncs(nlp, cfg, d)
        Z = z.reshape(K, w)
        grad = F.al_grad(Z, l[0], l[1], l[2], jnp.float32(316.0))
        p, bad = F.direction(Z, grad, l[0], l[1], l[2],
                             jnp.float32(316.0), jnp.float32(1e-3))
        return p

    def ls24(z, d, l):
        F = _ALFuncs(nlp, cfg, d)
        Z = z.reshape(K, w)
        alphas = 0.5 ** jnp.arange(24, dtype=jnp.float32)
        Zc = jnp.clip(Z[None] + alphas[:, None, None] * 0.01, F.lb, F.ub)
        cd, ce, g = jax.vmap(F.residuals)(Zc)
        cost = jax.vmap(F.cost)(Zc)
        return cd.sum() + ce.sum() + g.sum() + cost.sum()

    timeit("residual pass x1", jax.vmap(residuals), z0, bdata)
    timeit("al_grad", jax.vmap(al_grad), z0, bdata, lamB)
    timeit("gn_blocks (hess assembly)", jax.vmap(gn), z0, bdata, lamB)
    timeit("direction (grad+hess+kkt)", jax.vmap(direction), z0, bdata,
           lamB)
    timeit("line search 24 cand", jax.vmap(ls24), z0, bdata, lamB)
    log("done")


if __name__ == "__main__":
    main()
