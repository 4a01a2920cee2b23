"""Microbenchmarks for the solver's hot pieces on the real chip.

    python tools/profile_tpu.py [batch]

Times, per batched call: the block-tridiagonal factor+solve, the AL
gradient, the GN block build, one full newton_step, and the end-to-end
batched solve — to decide where Pallas effort pays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import dataclasses

import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, btridiag


def timeit(fn, *args, n=20):
    """Times with a per-call input perturbation: identical remote calls
    can be served from a cache on tunneled backends, which reports
    fantasy numbers."""
    out = fn(*args)
    jax.block_until_ready(out)

    def perturb(i):
        eps = jnp.float32(1e-6 * (i + 1))
        return [
            jax.tree.map(
                lambda x: x + eps
                if isinstance(x, jax.Array)
                and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                a,
            )
            for a in args
        ]

    variants = [perturb(i) for i in range(n)]
    _sync(variants)
    t0 = time.time()
    for v in variants:
        out = fn(*v)
    _sync(out)  # scalar host pull: the only reliable barrier on axon
    return (time.time() - t0) / n


def _sync(tree):
    """Force completion: block_until_ready can return early on tunneled
    backends; pulling a scalar to host cannot."""
    leaves = [
        x for x in jax.tree.leaves(tree)
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if leaves:
        float(jnp.sum(leaves[-1]))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    cfg = SolverConfig()
    F = al_sqp._ALFuncs(nlp, cfg, data)
    K, w = F.K, F.w
    print(f"B={B} K={K} w={w}", flush=True)

    key = jax.random.PRNGKey(0)
    D = jax.random.normal(key, (B, K, w, w), jnp.float32)
    D = jnp.einsum("bkij,bklj->bkil", D, D) + 5.0 * jnp.eye(w)
    O = 0.3 * jax.random.normal(key, (B, K - 1, w, w), jnp.float32)
    r = jax.random.normal(key, (B, K, w), jnp.float32)

    bt = jax.jit(jax.vmap(btridiag.solve))
    t = timeit(bt, D, O, r)
    print(f"btridiag solve:    {t*1e3:8.2f} ms/call "
          f"({t/B*1e6:.1f} us/lane)", flush=True)

    bdata = batch_tile(data, B)
    Z = jax.vmap(nlp.initial_guess)(bdata).reshape(B, K, w)
    lam = al_sqp.init_multipliers(nlp, data)
    blam = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), lam)
    rho = jnp.full((B,), cfg.rho0, jnp.float32)
    lm = jnp.full((B,), cfg.lm0, jnp.float32)

    def one(fn):
        def wrapped(Z, bdata, blam, rho):
            def single(z, dat, l, rh):
                Fi = al_sqp._ALFuncs(nlp, cfg, dat)
                return fn(Fi, z, l, rh)
            return jax.vmap(single)(Z, bdata, blam, rho)
        return jax.jit(wrapped)

    grad_fn = one(lambda Fi, z, l, rh: Fi.al_grad(z, l[0], l[1], l[2], rh))
    t = timeit(grad_fn, Z, bdata, blam, rho)
    print(f"al_grad:           {t*1e3:8.2f} ms/call", flush=True)

    blocks_fn = one(
        lambda Fi, z, l, rh: Fi.gn_blocks(
            z, l[0], l[1], l[2], rh,
            jnp.ones((K, w), bool), jnp.asarray(cfg.lm0, jnp.float32),
        )
    )
    t = timeit(blocks_fn, Z, bdata, blam, rho)
    print(f"gn_blocks:         {t*1e3:8.2f} ms/call", flush=True)

    def step_fn(Z, bdata, blam, rho, lm):
        def single(z, dat, l, rh, l2):
            Fi = al_sqp._ALFuncs(nlp, cfg, dat)
            zn, lmn, _ = Fi.newton_step(z, l[0], l[1], l[2], rh, l2)
            return zn, lmn
        return jax.vmap(single)(Z, bdata, blam, rho, lm)

    stepj = jax.jit(step_fn)
    t = timeit(stepj, Z, bdata, blam, rho, lm, n=10)
    print(f"newton_step:       {t*1e3:8.2f} ms/call", flush=True)

    cfg_fixed = SolverConfig(max_outer=8, max_inner=20)

    def full(d):
        res = al_sqp.solve_batched.__wrapped__(nlp, cfg_fixed, d, None, None)
        return res.z, res.status, res.inner_iters

    fullj = jax.jit(full)
    out = fullj(bdata)
    jax.block_until_ready(out)
    bdata2 = dataclasses.replace(
        bdata, x0=bdata.x0 + jnp.float32(1e-3)
    )
    jax.block_until_ready(bdata2)
    t0 = time.time()
    out = fullj(bdata2)
    jax.block_until_ready(out)
    t = time.time() - t0
    iters = int(np.max(np.asarray(out[2])))
    print(f"full solve:        {t*1e3:8.2f} ms/batch "
          f"(max inner iters {iters}, {t/max(iters,1)*1e3:.1f} ms/iter)",
          flush=True)


if __name__ == "__main__":
    main()
