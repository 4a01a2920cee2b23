"""Benchmark harness: batched VGP solves/s/chip at N=50 horizon.

The BASELINE.json metric ("VGP solves/s/chip at N=50 horizon; p50
receding-horizon solve latency"; north star 10k solves/s on a v5p-16,
i.e. 625 solves/s/chip). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus human-readable detail on stderr.
"""
import dataclasses
import json
import os
import sys
import time

import jax as _jax

if os.environ.get("JAX_PLATFORMS"):
    # TPU-image sitecustomize may override jax_platforms via config;
    # re-assert the env var's choice before backends initialize
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: compiles on the tunneled TPU backend run
# through a remote compile helper and are extremely slow (~200s for one
# Pallas kernel, ~80s for the solver XLA program, measured round 2), so
# a cold-cache bench run spends ~10-20 min compiling. The on-disk cache
# makes every repeat run (including the driver's) start in seconds.
_jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/etol_jaxcache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


import jax
import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, shooting

# north-star: 10k solves/s on a v5p-16 (16 chips) => 625 solves/s/chip
BASELINE_PER_CHIP = 625.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(nlp, data, B, key):
    bdata = batch_tile(data, B)
    kx, kg = jax.random.split(key)
    # scatter starts/goals so every lane is a distinct problem
    x0 = jnp.concatenate(
        [
            jax.random.uniform(kx, (B, 2), minval=-0.5, maxval=0.5),
            jnp.zeros((B, 1)),
        ],
        axis=1,
    ).astype(jnp.float32)
    xf = bdata.xf + jnp.concatenate(
        [
            jax.random.uniform(kg, (B, 2), minval=-0.5, maxval=0.5),
            jnp.zeros((B, 1)),
        ],
        axis=1,
    ).astype(jnp.float32)
    return dataclasses.replace(bdata, x0=x0, xf=xf)


def main():
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    nsteps = int(os.environ.get("BENCH_NSTEPS", "50"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    vgp, nlp = uas_2d(nsteps=nsteps)
    data, dims = vgp.to_device()
    kkt = "pallas" if jax.default_backend() == "tpu" else "scan"
    # rho0=316 pairs with the collision-free shooting seeds below: the
    # do-nothing low-rho outers are skipped (32/32 scattered lanes solve,
    # ~27% fewer Newton iterations than rho0=10). High rho0 without a
    # good seed IS harmful — keep the library default at 10.
    cfg = SolverConfig(
        max_outer=32, max_inner=100, rho0=316.0, kkt_solver=kkt
    )
    log(f"kkt_solver: {kkt}")
    shoot = int(os.environ.get("BENCH_SHOOTING", "512"))
    bdata = make_batch(nlp, data, B, jax.random.PRNGKey(0))

    # staged compaction (VERDICT r1 #1c): the vmapped while_loop runs to
    # the WORST lane (p50 = 398 Newton iterations, p99 = 1814 on this
    # config), so a plain batched solve burns >4x the median's FLOPs as
    # masked no-ops. Phase 1 runs the fleet at a p50-sized budget; the
    # tail continues warm in compacted sub-batches at 1/4 and 1/16 the
    # per-iteration cost.
    cold_budget = int(os.environ.get("BENCH_BUDGET0", "768"))
    cold_stages = ((max(B // 4, 1), 1024), (max(B // 16, 1), 2048))
    cfg_cold = dataclasses.replace(cfg, max_total=cold_budget)

    def run(d):
        z0 = None
        if shoot:
            # collision-free shooting seed per lane (the recommended
            # entry for nonconvex fields; rollout cost is trivial)
            z0 = jax.vmap(
                lambda dat: shooting.plan_guess(nlp, dat, shoot)
            )(d)
        res = al_sqp.solve_batched_staged.__wrapped__(
            nlp, cfg_cold, d, z0, cold_stages
        )
        # fold to scalars on-device so the sync below transfers O(1)
        # bytes; pulling a scalar to host is the only reliable
        # completion barrier on tunneled backends
        return (
            jnp.sum(res.z),
            jnp.mean((res.status == 1).astype(jnp.float32)),
            jnp.max(res.viol_eq),
            jnp.max(res.viol_in),
        ), res

    runj = jax.jit(run)

    t0 = time.time()
    out, res0 = runj(bdata)
    solved = float(out[1])  # host pull = completion barrier
    log(f"compile+first run: {time.time()-t0:.1f}s")
    log(f"solved fraction: {solved:.3f}  max viol: "
        f"{float(out[2]):.2e}/{float(out[3]):.2e}")

    # throughput: pre-stage all batches on device, dispatch back-to-back,
    # sync once at the end (steady-state pipeline; amortizes tunnel RTT)
    batches = [
        make_batch(nlp, data, B, jax.random.PRNGKey(i + 1))
        for i in range(iters)
    ]
    float(jnp.sum(batches[-1].x0))  # stage-in barrier
    t0 = time.time()
    acc = jnp.float32(0.0)
    for d in batches:
        acc = acc + runj(d)[0][0]
    float(acc)  # completion barrier
    t_all = time.time() - t0
    t_med = t_all / iters
    solves_per_s = B / t_med
    log(f"batch={B} N={nsteps} mean batch time {t_med*1e3:.1f}ms "
        f"-> {solves_per_s:.0f} cold solves/s/chip")

    # warm fleet-MPC throughput: re-solve the batch with perturbed x0,
    # warm-started from the previous solution (steady-state fleet MPC —
    # the production workload; eGurobi changeX0 fast path at scale).
    # res0 (the staged cold solve of bdata above) provides the fleet's
    # converged iterates/multipliers/penalties.
    # warm re-solves converge at p50 ~ 10 iterations but p99 lanes burn
    # the full budget — round 1's warm throughput equaled cold because
    # of that tail. A small phase-1 budget + compacted continuation is
    # the fix (eGurobi changeX0 economics, eGurobi.cpp:419-432).
    cfg_warm = dataclasses.replace(cfg, max_total=128)
    warm_stages = ((max(B // 8, 1), 1024), (max(B // 32, 1), 2048))

    def warm(d, z0, lam, rho):
        r = al_sqp.solve_batched_staged.__wrapped__(
            nlp, cfg_warm, d, z0, warm_stages, lam, rho
        )
        return jnp.sum(r.z), r.z, (r.lam_def, r.lam_eq, r.mu), r.rho

    warmj = jax.jit(warm)
    z0, lam, rho = res0.z, (res0.lam_def, res0.lam_eq, res0.mu), res0.rho
    d = bdata
    s, z0, lam, rho = warmj(d, z0, lam, rho)  # compile
    float(s)
    t0 = time.time()
    for i in range(iters):
        d = dataclasses.replace(
            d, x0=d.x0 + jnp.float32(0.01)
        )
        s, z0, lam, rho = warmj(d, z0, lam, rho)
    float(s)
    t_warm = (time.time() - t0) / iters
    warm_solves_per_s = B / t_warm
    log(f"warm fleet-MPC: {t_warm*1e3:.1f}ms/batch "
        f"-> {warm_solves_per_s:.0f} warm solves/s/chip")

    # p50 receding-horizon latency: warm-started single-problem re-solve,
    # measured per call including the host sync (that IS the MPC loop)
    res = al_sqp.solve(nlp, cfg, data)
    float(jnp.sum(res.z))
    lam = (res.lam_def, res.lam_eq, res.mu)

    def mpc(d2):
        r = al_sqp.solve.__wrapped__(nlp, cfg, d2, res.z, lam, res.rho)
        return jnp.sum(r.z), r.status
    mpcj = jax.jit(mpc)
    d2 = dataclasses.replace(data, x0=data.x0 + jnp.float32(0.01))
    float(mpcj(d2)[0])  # compile
    lat = []
    for i in range(20):
        d2 = dataclasses.replace(
            data, x0=data.x0 + jnp.float32(0.01 * (i + 1))
        )
        t0 = time.time()
        s, _ = mpcj(d2)
        float(s)
        lat.append(time.time() - t0)
    p50 = float(np.median(lat)) * 1e3
    log(f"p50 warm MPC re-solve latency: {p50:.2f}ms "
        f"(incl. host sync round-trip)")

    print(
        json.dumps(
            {
                "metric": "uas2d_n50_solves_per_s_per_chip",
                "value": round(solves_per_s, 2),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_s / BASELINE_PER_CHIP, 3),
                "extras": {
                    "batch": B,
                    "nsteps": nsteps,
                    "solved_fraction": solved,
                    "warm_solves_per_s_per_chip": round(
                        warm_solves_per_s, 2
                    ),
                    "p50_mpc_latency_ms": round(p50, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
