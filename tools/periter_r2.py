"""Per-iteration cost bisection: time the real vmapped solve at a fixed
iteration budget under ablations of the body's expensive pieces.
Run: python -u tools/periter_r2.py <variant>
Variants: base, ls1, ls8, gn, cr, scan, noobs
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
from etol_tpu.solve import SolverConfig, al_sqp

B = int(os.environ.get("PI_BATCH", "1024"))
MT = int(os.environ.get("PI_MT", "100"))


def main(variant):
    vgp, nlp = uas_2d(nsteps=50)
    if variant == "noobs":
        nlp = dataclasses.replace(nlp, use_obstacles=False)
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    kx = jax.random.PRNGKey(0)
    x0 = jnp.concatenate(
        [jax.random.uniform(kx, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1).astype(jnp.float32)
    bdata = dataclasses.replace(bdata, x0=x0)

    over = dict(
        base={},
        ls1=dict(ls_grid=1),
        ls8=dict(ls_grid=8),
        gn=dict(hessian="gn"),
        cr=dict(kkt_solver="cr"),
        scan=dict(kkt_solver="scan"),
        noobs={},
    )[variant]
    cfg = SolverConfig(max_outer=32, max_inner=100, rho0=316.0,
                       kkt_solver="pallas", max_total=MT, **over)

    def run(d):
        r = al_sqp.solve_batched.__wrapped__(nlp, cfg, d, None, None)
        return r.inner_iters, r.status

    runj = jax.jit(run)
    t0 = time.time()
    out = runj(bdata)
    jax.block_until_ready(out)
    tc = time.time() - t0
    t0 = time.time()
    out = runj(bdata)
    jax.block_until_ready(out)
    tr = time.time() - t0
    it = int(np.asarray(out[0]).max())
    print(f"{variant:6s} B={B} MT={MT}: compile+1st {tc:.1f}s "
          f"run {tr*1e3:.0f}ms -> {tr/max(it,1)*1e3:.2f} ms/iter "
          f"(maxit {it})", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "base")
