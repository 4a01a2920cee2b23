"""Round-2 config sweep: which knobs cut iterations-to-converge?

Baseline (bench cfg): median lane needs ~900 Newton iterations at
rho0=316 with shooting seeds. Sweep solver knobs at B=256 and report
(time, solved fraction, iteration percentiles) per variant.
Run: python -u tools/sweep_r2.py
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, shooting

B = int(os.environ.get("SWEEP_BATCH", "256"))
NSTEPS = 50
MT = 2000


def log(*a):
    print(*a, flush=True)


def make_batch(data, key):
    bdata = batch_tile(data, B)
    kx, kg = jax.random.split(key)
    x0 = jnp.concatenate(
        [jax.random.uniform(kx, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1).astype(jnp.float32)
    xf = bdata.xf + jnp.concatenate(
        [jax.random.uniform(kg, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1).astype(jnp.float32)
    return dataclasses.replace(bdata, x0=x0, xf=xf)


def main():
    base = dict(max_outer=64, max_inner=100, rho0=316.0,
                kkt_solver="pallas", max_total=MT)
    variants = [
        ("baseline", {}, "hermite_simpson"),
        ("trapezoid", {}, "trapezoidal"),
        ("rho0=30", dict(rho0=30.0), "hermite_simpson"),
        ("rho0=1000,g4", dict(rho0=1000.0, rho_growth=4.0),
         "hermite_simpson"),
        ("inner30", dict(max_inner=30), "hermite_simpson"),
        ("itol0=1e-1", dict(inner_tol0=1e-1), "hermite_simpson"),
        ("lsgrid12", dict(ls_grid=12), "hermite_simpson"),
        ("gnhess", dict(hessian="gn"), "hermite_simpson"),
        ("tolcons3e-4", dict(tol_cons=3e-4), "hermite_simpson"),
        ("cr", dict(kkt_solver="cr"), "hermite_simpson"),
    ]

    seeds = {}
    for name, over, scheme in variants:
        vgp, nlp = uas_2d(nsteps=NSTEPS)
        if scheme != "hermite_simpson":
            nlp = dataclasses.replace(nlp, scheme=scheme)
        data, dims = vgp.to_device()
        bdata = make_batch(data, jax.random.PRNGKey(0))
        if scheme not in seeds:
            seedj = jax.jit(lambda d, n=nlp: jax.vmap(
                lambda dat: shooting.plan_guess(n, dat, 512))(d))
            z0 = seedj(bdata)
            jax.block_until_ready(z0)
            seeds[scheme] = z0
        z0 = seeds[scheme]
        cfg = SolverConfig(**{**base, **over})

        def run(d, z, n=nlp, c=cfg):
            r = al_sqp.solve_batched.__wrapped__(n, c, d, z, None)
            return (r.inner_iters, r.outer_iters, r.status, r.viol_eq,
                    r.viol_in, r.rho)

        runj = jax.jit(run)
        t0 = time.time()
        out = runj(bdata, z0)
        jax.block_until_ready(out[0])
        tc = time.time() - t0
        t0 = time.time()
        out = runj(bdata, z0)
        jax.block_until_ready(out[0])
        tr = time.time() - t0
        it = np.asarray(out[0])
        ot = np.asarray(out[1])
        st = np.asarray(out[2])
        vmax = max(np.asarray(out[3]).max(), np.asarray(out[4]).max())
        rho = np.asarray(out[5])
        log(f"{name:14s} run {tr*1e3:7.0f}ms (c {tc:5.1f}s) "
            f"solved {(st == 1).mean():.3f} "
            f"it p50/90/max {np.percentile(it, 50):.0f}/"
            f"{np.percentile(it, 90):.0f}/{it.max()} "
            f"outer p50/max {np.percentile(ot, 50):.0f}/{ot.max()} "
            f"rho p50 {np.percentile(rho, 50):.0f} viol {vmax:.1e}")
    log("done")


if __name__ == "__main__":
    main()
