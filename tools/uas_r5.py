"""Round-5 headline retune: pieces containment + goal-pulled seeds.

The r5 finding (docs/perf.md): dropping the belt-and-braces edge-ellipse
bands and enforcing obstacle exclusion through the convex-piece softmin
containment ALONE — the reference MILP's own node-wise semantics
(per-timestep big-M side rows, eGLPK.cpp:190-246; its NSIDES square
approximations are node-wise too) — halves the iteration CDF
(B=256 CPU: p50 85 -> 48, p99 176 -> 64) at equal objectives, with
every node still strictly outside the (tau-inflated) pieces. Goal-pulled
seeds shift it again (p50 41). This tool sweeps budget/stage ladders on
the chip for the new CDF, timing seed generation + solve end-to-end
like the bench.

Usage: python tools/uas_r5.py [B] [variant ...]
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

from etol_tpu.bench_harness import make_batch
from etol_tpu.models import uas_2d
from etol_tpu.models.tuned import _TUNED
from etol_tpu.solve import SolverConfig, al_sqp, shooting


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    kkt = "pallas" if jax.default_backend() == "tpu" else "scan"
    print(f"device {jax.devices()[0].platform} kkt={kkt} B={B}",
          flush=True)
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    bdata = make_batch(nlp, data, B, jax.random.PRNGKey(0))
    more = [
        make_batch(nlp, data, B, jax.random.PRNGKey(i + 1))
        for i in range(3)
    ]
    ov, _ = _TUNED["uas_2d"]
    nlp_p = dataclasses.replace(nlp, obstacle_form="pieces")

    def run(name, the_nlp, budget, stages, pulled=0, walks=512,
            reps=3, **over):
        cfg = SolverConfig(kkt_solver=kkt, **{
            **ov, "max_total": budget, **over,
        })
        st_abs = tuple((max(B // d, 1), b) for d, b in stages)

        def go(d):
            z0 = jax.vmap(
                lambda dat: shooting.plan_guess(
                    nlp, dat, walks, pulled=pulled
                )
            )(d)
            res, trips = al_sqp.solve_batched_staged.__wrapped__(
                the_nlp, cfg, d, z0, st_abs, return_stage_trips=True
            )
            return (
                jnp.sum(res.z),
                jnp.mean((res.status == 1).astype(jnp.float32)),
                jnp.stack(trips),
                jnp.max(jnp.maximum(res.viol_eq, res.viol_in)),
            )

        goj = jax.jit(go)
        out = goj(bdata)
        solved = float(out[1])
        t0 = time.time()
        acc = jnp.float32(0.0)
        sf = []
        reps = min(reps, len(more))  # t below divides by the ACTUAL count
        for d in more[:reps]:
            o = goj(d)
            acc = acc + o[0]
            sf.append(o[1])
        float(acc)
        t = (time.time() - t0) / reps
        sr = float(jnp.mean(jnp.stack(sf)))
        sps = B * sr / t
        print(f"{name:44s} solved {sr:.4f} trips "
              f"{np.asarray(out[2]).astype(int).tolist()} viol "
              f"{float(out[3]):.1e} {t*1e3:7.1f}ms -> {sps:7.0f}/s",
              flush=True)
        return sps

    variants = sys.argv[2:] or ["base", "ship", "p40", "p48"]
    for v in variants:
        if v == "base":
            run("r4 shipped (both, 83 + 2:32/8:96/32:1024)", nlp, 83,
                ((2, 32), (8, 96), (32, 1024)))
        elif v == "ship":
            # the SHIPPED config, read live from the registry (final
            # r5: rho0 3160/g5.6, 33 + 2:16/8:32/32:96, ls16 — 3369
            # cold solves/s at solved 1.000 in BENCH_r05). NOTE: a
            # p50-sized phase-1 budget needs a B/2-capacity first
            # stage — B/8 ladders strand the ~half of lanes the budget
            # leaves unfinished (first sweep's mistake)
            # run() already builds its cfg from the registry overrides,
            # so only budget/stages/seeds need passing
            sov, sstages = _TUNED["uas_2d"]
            from etol_tpu.models.tuned import tuned_extras

            sex = tuned_extras("uas_2d")
            run("SHIPPED registry config", nlp_p, sov["max_total"],
                sstages, pulled=sex.get("seed_pulled", 0),
                walks=sex.get("seed_walks", 512))
        elif v == "p40":
            run("pieces 40 + 2:24/8:48/32:128 w256+pull16", nlp_p, 40,
                ((2, 24), (8, 48), (32, 128)), pulled=16, walks=256)
        elif v == "p48":
            run("pieces 48 + 2:24/8:48/32:128 w512", nlp_p, 48,
                ((2, 24), (8, 48), (32, 128)))


if __name__ == "__main__":
    main()
