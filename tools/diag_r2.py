"""Round-2 throughput diagnosis: where do the 32.8s/batch go?

Hypotheses to test on the real chip:
  H1: the batched while_loop runs to max_total because a few lanes never
      converge -> iteration distribution from res.inner_iters.
  H2: per-iteration cost ~10ms, dominated by the 2x pallas KKT solve
      (3.1ms each) + 24-candidate line search -> slope of time vs budget.
  H3: warm fleet re-solves converge in few iters but a tail of lanes
      burns the budget -> warm inner_iters distribution.
Run: python -u tools/diag_r2.py
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

KKT = "pallas" if jax.default_backend() == "tpu" else "scan"

B = int(os.environ.get("DIAG_BATCH", "1024"))
NSTEPS = 50


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


def pct(it):
    return (f"{np.percentile(it, 50):.0f}/{np.percentile(it, 90):.0f}/"
            f"{np.percentile(it, 99):.0f}/{it.max()}")


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    vgp, nlp = uas_2d(nsteps=NSTEPS)
    data, dims = vgp.to_device()
    bdata = make_batch(data, jax.random.PRNGKey(0))

    t0 = time.time()
    seedj = jax.jit(lambda d: jax.vmap(
        lambda dat: shooting.plan_guess(nlp, dat, 512))(d))
    z0 = seedj(bdata)
    jax.block_until_ready(z0)
    log(f"shooting seed compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    z0 = seedj(bdata)
    jax.block_until_ready(z0)
    log(f"shooting seed time: {(time.time()-t0)*1e3:.1f}ms")

    warm_state = None
    for mt in (200, 400, 3200):
        cfg = SolverConfig(max_outer=32, max_inner=100, rho0=316.0,
                           kkt_solver=KKT, max_total=mt)

        def run(d, z):
            r = al_sqp.solve_batched.__wrapped__(nlp, cfg, d, z, None)
            return (r.inner_iters, r.status, r.viol_eq, r.viol_in,
                    r.z, (r.lam_def, r.lam_eq, r.mu), r.rho)

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
        st = np.asarray(out[1])
        ve, vi = np.asarray(out[2]), np.asarray(out[3])
        log(f"max_total={mt}: compile+1st {tc:.1f}s run {tr*1e3:.0f}ms "
            f"solved {(st == 1).mean():.3f} iters p50/90/99/max {pct(it)} "
            f"maxviol {max(ve.max(), vi.max()):.2e}")
        if mt == 3200:
            warm_state = (out[4], out[5], out[6])

    # ---- warm-start re-solve diagnosis (H3) -----------------------------
    z, lam, rho = warm_state
    cfg = SolverConfig(max_outer=32, max_inner=100, rho0=316.0,
                       kkt_solver=KKT, max_total=3200)

    def warm(d, z0_, lam_, rho_):
        r = al_sqp.solve_batched.__wrapped__(nlp, cfg, d, z0_, lam_, rho_)
        return r.inner_iters, r.status, r.rho

    warmj = jax.jit(warm)
    d2 = dataclasses.replace(bdata, x0=bdata.x0 + jnp.float32(0.01))
    t0 = time.time()
    out = warmj(d2, z, lam, rho)
    jax.block_until_ready(out[0])
    tc = time.time() - t0
    t0 = time.time()
    out = warmj(d2, z, lam, rho)
    jax.block_until_ready(out[0])
    tr = time.time() - t0
    it = np.asarray(out[0])
    st = np.asarray(out[1])
    rr = np.asarray(out[2])
    log(f"warm: compile+1st {tc:.1f}s run {tr*1e3:.0f}ms "
        f"solved {(st == 1).mean():.3f} iters p50/90/99/max {pct(it)} "
        f"rho p50/max {np.percentile(rr, 50):.0f}/{rr.max():.0f}")
    log("done")


if __name__ == "__main__":
    main()
