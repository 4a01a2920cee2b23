"""Per-iteration cost bisection: time the real vmapped solve at a fixed
iteration budget under ablations of the body's expensive pieces.
Run: python -u tools/periter_r2.py <variant> [<variant> ...]
Variants: base, trap, ls1, ls8, gn, cr, scan, noobs

Timing discipline: a scalar host pull (float()) is the completion
barrier — block_until_ready is NOT reliable on tunneled backends
(the axon remote TPU acks enqueue, not completion).
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

VARIANTS = dict(
    base={},
    trap={},
    obsell={},
    obspc={},
    ls1=dict(ls_grid=1),
    ls8=dict(ls_grid=8),
    ls12=dict(ls_grid=12),
    gnh=dict(hessian="gn"),
    gn=dict(hessian="gn"),
    cr=dict(kkt_solver="cr"),
    scan=dict(kkt_solver="scan"),
    noobs={},
)


def run_variant(variant):
    vgp, nlp = uas_2d(nsteps=50)
    if variant == "noobs":
        nlp = dataclasses.replace(nlp, use_obstacles=False)
    if variant == "trap":
        nlp = dataclasses.replace(nlp, scheme="trapezoidal")
    if variant == "obsell":
        nlp = dataclasses.replace(nlp, obstacle_form="ellipses")
    if variant == "obspc":
        nlp = dataclasses.replace(nlp, obstacle_form="pieces")
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    kx = jax.random.PRNGKey(0)
    x0 = jnp.concatenate(
        [jax.random.uniform(kx, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1).astype(jnp.float32)
    bdata = dataclasses.replace(bdata, x0=x0)

    over = VARIANTS[variant]
    kw = dict(max_outer=32, max_inner=100, rho0=316.0,
              kkt_solver="pallas", max_total=MT)
    kw.update(over)
    cfg = SolverConfig(**kw)

    def run(d):
        r = al_sqp.solve_batched.__wrapped__(nlp, cfg, d, None, None)
        # fold to a scalar so the host pull is O(1) bytes and a true
        # completion barrier
        return jnp.sum(r.z) + jnp.sum(r.inner_iters.astype(jnp.float32))

    runj = jax.jit(run)
    t0 = time.time()
    float(runj(bdata))
    tc = time.time() - t0
    reps = 3
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = acc + runj(bdata)
    float(acc)
    tr = (time.time() - t0) / reps
    print(f"{variant:6s} B={B} MT={MT}: compile+1st {tc:.1f}s "
          f"run {tr*1e3:.0f}ms -> {tr/MT*1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["base"]:
        run_variant(v)
