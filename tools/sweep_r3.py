"""Round-3 convergence sweep: iteration-count CDF under solver-config
variants on the bench problem (uas_2d N=50, shooting seeds).

    JAX_PLATFORMS=cpu python -u tools/sweep_r3.py v1 v2 ...

Prints per variant: solved fraction, iteration percentiles, max viol.
The round-3 target (VERDICT #2): p50 <= 150 at solved >= 0.95.
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
from etol_tpu.solve import SolverConfig, al_sqp, shooting

B = int(os.environ.get("SW_BATCH", "64"))
MT = int(os.environ.get("SW_MT", "1600"))
KKT = "pallas" if jax.default_backend() == "tpu" else "scan"

BASE = dict(max_outer=64, max_inner=100, rho0=316.0, kkt_solver=KKT,
            max_total=MT)

VARIANTS = dict(
    base={},
    full=dict(hessian="full"),
    st5=dict(stall_tol=1e-5),
    st4=dict(stall_tol=1e-4),
    mi25=dict(max_inner=25),
    mi12=dict(max_inner=12),
    mi25rg3=dict(max_inner=25, rho_growth=3.16),
    mi12rg3=dict(max_inner=12, rho_growth=3.16),
    rho1k=dict(rho0=1000.0),
    rho100=dict(rho0=100.0),
    st5mi25=dict(stall_tol=1e-5, max_inner=25),
    # code-change knobs (only valid once implemented):
    eta=dict(ls_eta=0.85),
    vp12=dict(round_viol_patience=12),
    vp8=dict(round_viol_patience=8),
    vp12rg3=dict(round_viol_patience=12, rho_growth=3.16),
    vp8eta=dict(round_viol_patience=8, ls_eta=0.85),
    vp12eta=dict(round_viol_patience=12, ls_eta=0.85),
    best=dict(ls_rule="best"),
    ratio=dict(lm_rule="ratio"),
    bestratio=dict(ls_rule="best", lm_rule="ratio"),
    fullratio=dict(hessian="full", lm_rule="ratio"),
    bestfull=dict(ls_rule="best", hessian="full"),
    bestfullratio=dict(ls_rule="best", hessian="full", lm_rule="ratio"),
    bre=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85),
    brevp=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
               round_viol_patience=12),
    br1k=dict(ls_rule="best", lm_rule="ratio", rho0=1000.0),
    brvp=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=12),
    brvp8=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=8),
    brvp1k=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=12,
                rho0=1000.0),
    brmi25=dict(ls_rule="best", lm_rule="ratio", max_inner=25),
    brmi50=dict(ls_rule="best", lm_rule="ratio", max_inner=50),
    brrg3=dict(ls_rule="best", lm_rule="ratio", rho_growth=3.16),
    brrg3vp=dict(ls_rule="best", lm_rule="ratio", rho_growth=3.16,
                 round_viol_patience=12),
    brst6=dict(ls_rule="best", lm_rule="ratio", stall_tol=1e-6),
    brevp1k=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
                 round_viol_patience=12, rho0=1000.0),
    brevp8=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
                round_viol_patience=8),
    brevp6=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
                round_viol_patience=6),
    brevprg3=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
                  round_viol_patience=12, rho_growth=3.16),
    brevp8rg3=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
                   round_viol_patience=8, rho_growth=3.16),
    brevpe95=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.95,
                  round_viol_patience=12),
    brevpf8=dict(ls_rule="best", lm_rule="ratio", ls_eta=0.85,
                 round_viol_patience=12, round_viol_factor=0.8),
    revp=dict(lm_rule="ratio", ls_eta=0.85, round_viol_patience=12),
    brvp6x=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=6),
    brvp8rg3=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=8,
                  rho_growth=3.16),
    brvp81k=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=8,
                 rho0=1000.0),
    brvp8f8=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=8,
                 round_viol_factor=0.8),
    rvp8=dict(lm_rule="ratio", round_viol_patience=8),
    rvp4=dict(lm_rule="ratio", round_viol_patience=4),
    rvp4rg3=dict(lm_rule="ratio", round_viol_patience=4,
                 rho_growth=3.16),
    rvp6=dict(lm_rule="ratio", round_viol_patience=6),
    rvp41k=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0),
    rvp43k=dict(lm_rule="ratio", round_viol_patience=4, rho0=3162.0),
    rvp31k=dict(lm_rule="ratio", round_viol_patience=3, rho0=1000.0),
    rvp4f85=dict(lm_rule="ratio", round_viol_patience=4,
                 round_viol_factor=0.85),
    rvp4mi50=dict(lm_rule="ratio", round_viol_patience=4, max_inner=50),
    rvp4lm=dict(lm_rule="ratio", round_viol_patience=4, lm0=1e-4),
    rvp41krg3=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                   rho_growth=3.16),
    deep8=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
               rho_growth=3.16, ls_deep_round=8),
    deep10=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                rho_growth=3.16, ls_deep_round=10),
    deep12=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                rho_growth=3.16, ls_deep_round=12),
    dr13=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
              rho_growth=3.16, dual_relax=1.3),
    dr16=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
              rho_growth=3.16, dual_relax=1.6),
    dr19=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
              rho_growth=3.16, dual_relax=1.9),
    dr16rg2=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                 dual_relax=1.6),
    sparse13=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                  rho_growth=3.16,
                  ls_exponents=(0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 14, 18, 22)),
    sparse10=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                  rho_growth=3.16,
                  ls_exponents=(0, 1, 2, 3, 4, 6, 8, 11, 15, 20)),
    rvp41krg25=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                    rho_growth=2.5),
    rvp31krg3=dict(lm_rule="ratio", round_viol_patience=3, rho0=1000.0,
                   rho_growth=3.16),
    rvp41krm=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                  rho_max=3e4),
    rvp41kgn=dict(lm_rule="ratio", round_viol_patience=4, rho0=1000.0,
                  hessian="gn"),
    rvp41krg3gn=dict(lm_rule="ratio", round_viol_patience=4,
                     rho0=1000.0, rho_growth=3.16, hessian="gn"),
    brvp4=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=4),
    brvp6rg3=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=6,
                  rho_growth=3.16),
    brvp2=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=2),
    brvp3=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=3),
    brvp4rg3=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=4,
                  rho_growth=3.16),
    brvp41k=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=4,
                 rho0=1000.0),
    brvp4f8=dict(ls_rule="best", lm_rule="ratio", round_viol_patience=4,
                 round_viol_factor=0.8),
)


def make_batch(nlp, data, key):
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
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    bdata = make_batch(nlp, data, jax.random.PRNGKey(0))
    z0 = jax.jit(lambda d: jax.vmap(
        lambda dat: shooting.plan_guess(nlp, dat, 512))(d))(bdata)
    jax.block_until_ready(z0)

    for name in sys.argv[1:] or ["base"]:
        kw = dict(BASE)
        kw.update(VARIANTS[name])
        try:
            cfg = SolverConfig(**kw)
        except TypeError as e:
            print(f"{name:10s} SKIP ({e})", flush=True)
            continue
        runj = jax.jit(lambda d, z, c=cfg: al_sqp.solve_batched.__wrapped__(
            nlp, c, d, z, None))
        t0 = time.time()
        res = runj(bdata, z0)
        jax.block_until_ready(res.z)
        tc = time.time() - t0
        it = np.asarray(res.inner_iters)
        st = np.asarray(res.status)
        ok = st == 1
        vmax = max(float(np.max(res.viol_eq)), float(np.max(res.viol_in)))
        oks = it[ok] if ok.any() else np.array([MT])
        print(
            f"{name:10s} solved {ok.mean():.3f} "
            f"iters(all) p50/90/99 {np.percentile(it, 50):.0f}/"
            f"{np.percentile(it, 90):.0f}/{np.percentile(it, 99):.0f} "
            f"iters(ok) p50/90 {np.percentile(oks, 50):.0f}/"
            f"{np.percentile(oks, 90):.0f} "
            f"maxviol {vmax:.1e} obj_mean "
            f"{float(np.mean(np.asarray(res.obj)[ok])) if ok.any() else float('nan'):.3f} "
            f"[{tc:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
