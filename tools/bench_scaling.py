"""Secondary benchmark: the BASELINE.md scaling ladder beyond the
headline N=50 UAS metric.

Configs (BASELINE.md "Scaling configs"):
  1. 2D point-mass (double integrator), N=20
  2. 2D UAS multi-obstacle, N=50  (the bench.py headline — skipped here)
  3. 3D moving obstacles, N=40
  4. nonlinear fixed-wing 3-DOF, N=100
  5. 4096-problem fleet MPC (headline problem at 4x batch)

Prints one line per config: SOLVED solves/s/chip (honest — solved lanes
only) + solved fraction. Not wired to the driver (bench.py stays the
single-line contract); run manually:

    python -u tools/bench_scaling.py [config ...]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/etol_jaxcache"),
)

import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import (
    double_integrator_2d,
    fixed_wing_3dof,
    point_mass_3d,
    tuned_config,
    uas_2d,
)
from etol_tpu.solve import al_sqp, shooting


def log(*a):
    print(*a, flush=True)


def scatter_x0(data, B, scale, dims_free, key):
    bdata = batch_tile(data, B)
    nx = bdata.x0.shape[-1]
    d = jax.random.uniform(
        key, (B, nx), minval=-scale, maxval=scale
    ).astype(jnp.float32)
    mask = jnp.zeros((nx,)).at[jnp.asarray(dims_free)].set(1.0)
    return dataclasses.replace(bdata, x0=bdata.x0 + d * mask)


def apply_extras(nlp, model):
    """Apply the registry's model-level transcription choice (e.g. the
    uas pieces containment — models/tuned.py _MODEL_EXTRAS)."""
    from etol_tpu.models.tuned import tuned_extras

    ex = tuned_extras(model)
    if "obstacle_form" in ex:
        nlp = dataclasses.replace(
            nlp, obstacle_form=ex["obstacle_form"]
        )
    if "scheme" in ex:
        nlp = dataclasses.replace(nlp, scheme=ex["scheme"])
    return nlp, ex


def run_config(name, nlp, bdata, cfg, stages, shoot=0, reps=3,
               pulled=0):
    B = bdata.x0.shape[0]

    def run(d):
        z0 = None
        if shoot:
            z0 = jax.vmap(
                lambda dat: shooting.plan_guess(
                    nlp, dat, shoot, pulled=pulled
                )
            )(d)
        res = al_sqp.solve_batched_staged.__wrapped__(
            nlp, cfg, d, z0, stages
        )
        return (
            jnp.sum(res.z),
            jnp.mean((res.status == 1).astype(jnp.float32)),
            jnp.max(jnp.maximum(res.viol_eq, res.viol_in)),
        )

    runj = jax.jit(run)
    t0 = time.time()
    out = runj(bdata)
    solved = float(out[1])
    tc = time.time() - t0
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = acc + runj(bdata)[0]
    float(acc)
    t = (time.time() - t0) / reps
    sps = B * solved / t
    log(f"{name:28s} B={B:5d} solved {solved:.3f} "
        f"viol {float(out[2]):.1e} {t*1e3:7.1f} ms/batch -> "
        f"{sps:7.0f} SOLVED solves/s/chip (compile {tc:.0f}s)")
    return sps, solved


def main():
    which = set(sys.argv[1:]) or {"pm20", "pm3d", "fw100", "fleet4096"}
    # batch multiplier for B-amortization sweeps (the r5 headline
    # finding: op-overhead-bound programs gain ~11% at 2x batch)
    mul = int(os.environ.get("LADDER_BMUL", "1"))
    kkt = "pallas" if jax.default_backend() == "tpu" else "scan"
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # Solver configs come from the measured per-model registry
    # (etol_tpu/models/tuned.py) — single source of truth; the
    # methodology and sweep data live in docs/perf.md and the
    # tools/*_r3.py / *_r4.py measurement scripts.

    if "pm20" in which:
        vgp, nlp = double_integrator_2d()
        nlp, _ = apply_extras(nlp, "double_integrator_2d")
        data, dims = vgp.to_device()
        bdata = scatter_x0(
            data, 1024 * mul, 0.4, [0, 1], jax.random.PRNGKey(0)
        )
        cfg, stages = tuned_config(
            "double_integrator_2d", batch=1024 * mul, kkt_solver=kkt
        )
        run_config("point-mass 2D N=20", nlp, bdata, cfg, stages)

    if "pm3d" in which:
        vgp, nlp = point_mass_3d(nsteps=40)
        data, dims = vgp.to_device()
        bdata = scatter_x0(
            data, 1024 * mul, 0.3, [0, 1, 2], jax.random.PRNGKey(1)
        )
        cfg, stages = tuned_config(
            "point_mass_3d", batch=1024 * mul, kkt_solver=kkt
        )
        run_config("3D moving obstacles N=40", nlp, bdata, cfg, stages)

    if "fw100" in which:
        vgp, nlp = fixed_wing_3dof()  # N=100
        nlp, _ = apply_extras(nlp, "fixed_wing_3dof")
        data, dims = vgp.to_device()
        bdata = scatter_x0(
            data, 256 * mul, 0.05, [0, 1], jax.random.PRNGKey(2)
        )
        cfg, stages = tuned_config(
            "fixed_wing_3dof", batch=256 * mul, kkt_solver=kkt
        )
        run_config("fixed-wing 3-DOF N=100", nlp, bdata, cfg, stages)

    if "fleet4096" in which:
        vgp, nlp = uas_2d(nsteps=50)
        nlp, ex = apply_extras(nlp, "uas_2d")
        data, dims = vgp.to_device()
        bdata = scatter_x0(
            data, 4096 * mul, 0.5, [0, 1], jax.random.PRNGKey(3)
        )
        cfg, stages = tuned_config(
            "uas_2d", batch=4096 * mul, kkt_solver=kkt
        )
        run_config(
            "UAS fleet MPC N=50 B=4096", nlp, bdata, cfg, stages,
            shoot=ex.get("seed_walks", 512),
            pulled=ex.get("seed_pulled", 0),
        )


if __name__ == "__main__":
    main()
