"""Round-5: on-chip timing of the separable-scheme fast assembly.

Times one full cold batched solve (fixed budget, no stages) of the
bench's uas N=50 workload under scheme/assembly variants. Timing
discipline: jit once, dispatch reps back-to-back, one scalar pull.

Usage: python tools/sep_tpu_r5.py [B] [variant ...]
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
    print(f"device {jax.devices()[0].platform} kkt={kkt}", flush=True)
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    bdata = make_batch(nlp, data, B, jax.random.PRNGKey(0))
    ov, _ = _TUNED["uas_2d"]

    def run(name, the_nlp, sep, budget=80, reps=3, chord=0):
        cfg = SolverConfig(kkt_solver=kkt, **{
            **ov, "max_total": budget, "sep_assembly": sep,
            "chord_steps": chord,
        })

        def go(d):
            z0 = jax.vmap(
                lambda dat: shooting.plan_guess(nlp, dat, 512)
            )(d)
            res = al_sqp.solve_batched.__wrapped__(
                the_nlp, cfg, d, z0, None
            )
            return (jnp.sum(res.z),
                    jnp.mean((res.status == 1).astype(jnp.float32)),
                    jnp.max(res.inner_iters))

        goj = jax.jit(go)
        t0 = time.time()
        out = goj(bdata)
        solved = float(out[1])
        tc = time.time() - t0
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(reps):
            acc = acc + goj(bdata)[0]
        float(acc)
        t = (time.time() - t0) / reps
        trips = int(out[2])
        print(f"{name:34s} B={B} solved {solved:.3f} trips {trips:3d} "
              f"{t*1e3:7.1f} ms -> {t*1e3/trips:6.3f} ms/trip "
              f"(compile {tc:.0f}s)", flush=True)

    variants = sys.argv[2:] or ["hs", "trap", "trap_nosep"]
    nlp_tr = dataclasses.replace(nlp, scheme="trapezoidal")
    for v in variants:
        if v == "hs":
            run("hermite_simpson (shipped)", nlp, True)
        elif v == "trap":
            run("trapezoidal sep", nlp_tr, True)
        elif v == "trap_nosep":
            run("trapezoidal generic", nlp_tr, False)
        elif v == "trap_chord1":
            run("trapezoidal sep chord1", nlp_tr, True, chord=1)


if __name__ == "__main__":
    main()
