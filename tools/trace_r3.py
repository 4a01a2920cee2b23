"""Round-3 iteration-count forensics: per-iteration trace of the
flattened AL-SQP on the hardest bench lanes.

Reproduces the bench config (uas_2d N=50, shooting seeds, rho0=316),
solves a batch, picks the lanes with the most Newton iterations, and
replays them through _solve_single(trace_iters=...) to print the full
per-iteration story: AL value, projected-gradient norm, violation, rho,
accepted step exponent, round transitions.

    JAX_PLATFORMS=cpu python -u tools/trace_r3.py [B] [n_trace]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, shooting

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
NTRACE = int(sys.argv[2]) if len(sys.argv) > 2 else 2
TRACE_ITERS = int(os.environ.get("TRACE_ITERS", "1600"))
KKT = "pallas" if jax.default_backend() == "tpu" else "scan"


def main():
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    kx, kg = jax.random.split(jax.random.PRNGKey(0))
    x0 = jnp.concatenate(
        [jax.random.uniform(kx, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1).astype(jnp.float32)
    xf = bdata.xf + jnp.concatenate(
        [jax.random.uniform(kg, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1).astype(jnp.float32)
    bdata = dataclasses.replace(bdata, x0=x0, xf=xf)

    cfg = SolverConfig(
        max_outer=64, max_inner=100,
        rho0=float(os.environ.get("TRACE_RHO0", "1000")),
        rho_growth=float(os.environ.get("TRACE_RG", "3.16")),
        round_viol_patience=int(os.environ.get("TRACE_VP", "4")),
        kkt_solver=KKT, max_total=TRACE_ITERS)

    seedj = jax.jit(lambda d: jax.vmap(
        lambda dat: shooting.plan_guess(nlp, dat, 512))(d))
    z0 = seedj(bdata)

    runj = jax.jit(lambda d, z: al_sqp.solve_batched.__wrapped__(
        nlp, cfg, d, z, None))
    res = runj(bdata, z0)
    it = np.asarray(res.inner_iters)
    st = np.asarray(res.status)
    print(f"B={B} solved {(st == 1).mean():.3f} iters "
          f"p50/90/99/max {np.percentile(it, 50):.0f}/"
          f"{np.percentile(it, 90):.0f}/{np.percentile(it, 99):.0f}/"
          f"{it.max()}", flush=True)

    order = np.argsort(-it)
    lam0 = al_sqp.init_multipliers(
        nlp, jax.tree.map(lambda a: a[0], bdata))

    tracej = jax.jit(lambda d, z: al_sqp._solve_single(
        nlp, cfg, d, z, lam0, trace_iters=TRACE_ITERS))
    for rank in range(NTRACE):
        lane = int(order[rank])
        d1 = jax.tree.map(lambda a: a[lane], bdata)
        r1, hist = tracej(d1, z0[lane])
        hist = jax.tree.map(np.asarray, hist)
        n = int(np.sum(hist["active"]))
        print(f"\n=== lane {lane}: iters={int(r1.inner_iters)} "
              f"status={int(r1.status)} obj={float(r1.obj):.4f} "
              f"viol={float(r1.viol_eq):.2e}/{float(r1.viol_in):.2e}")
        # per-iteration rows (compressed: print every iteration for the
        # first 60, then every 10th)
        for i in range(n):
            if i > 60 and i % 10 != 0 and not hist["round_end"][i]:
                continue
            print(
                f"  it {i:4d} val {hist['val'][i]:+.6e} "
                f"d {hist['val'][i]-hist['val_new'][i]:+.2e} "
                f"pgn {hist['pgn'][i]:.2e} viol {hist['viol'][i]:.2e} "
                f"rho {hist['rho'][i]:8.0f} lm {hist['lm'][i]:.1e} "
                f"a 2^-{int(hist['alpha_exp'][i]):2d}"
                f"{' NOLS' if not hist['ls_ok'][i] else ''}"
                f"{' BAD' if hist['bad_dir'][i] else ''}"
                f"{' ROUND' if hist['round_end'][i] else ''}"
            )


if __name__ == "__main__":
    main()
