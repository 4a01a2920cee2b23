"""Round-4 warm fleet-MPC economics (VERDICT r3 do #5).

Measures the WARM re-solve iteration CDF of the headline workload and
sweeps the warm budget/stage shape against it, to either reach >= 4x
the honest cold headline or document the measured tail bound.

Run on the TPU: python tools/warm_r4.py [cdf] [sweep]
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
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/etol_jaxcache"),
)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.solve import SolverConfig, al_sqp, shooting


def make_batch(nlp, data, B, key):
    bdata = batch_tile(data, B)
    kx, kg = jax.random.split(key)
    x0 = jnp.concatenate(
        [jax.random.uniform(kx, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1,
    ).astype(jnp.float32)
    xf = bdata.xf + jnp.concatenate(
        [jax.random.uniform(kg, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1,
    ).astype(jnp.float32)
    return dataclasses.replace(bdata, x0=x0, xf=xf)


def main():
    which = set(sys.argv[1:]) or {"cdf", "sweep"}
    B = int(os.environ.get("B", "1024"))
    dev = jax.devices()[0]
    kkt = "pallas" if jax.default_backend() == "tpu" else "scan"
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)

    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    cfg = SolverConfig(
        max_outer=64, max_inner=100, rho0=1000.0, kkt_solver=kkt,
        lm_rule="ratio", round_viol_patience=4, rho_growth=3.16,
    )
    bdata = make_batch(nlp, data, B, jax.random.PRNGKey(0))

    # cold solve -> warm state (the bench's exact cold config)
    cfg_cold = dataclasses.replace(cfg, max_total=83)

    @jax.jit
    def cold(d):
        z0 = jax.vmap(lambda dat: shooting.plan_guess(nlp, dat, 512))(d)
        return al_sqp.solve_batched_staged.__wrapped__(
            nlp, cfg_cold, d, z0, ((B // 2, 32), (B // 8, 96),
                                   (B // 32, 1024))
        )

    res0 = cold(bdata)
    float(jnp.sum(res0.z))
    print("cold solved", float(jnp.mean((res0.status == 1) * 1.0)),
          flush=True)
    lam0 = (res0.lam_def, res0.lam_eq, res0.mu)

    d1 = dataclasses.replace(bdata, x0=bdata.x0 + jnp.float32(0.01))

    if "cdf" in which:
        # warm iteration CDF at a generous budget (captures the tail)
        cfg_w = dataclasses.replace(cfg, max_total=400)

        @jax.jit
        def warm_cdf(d, z0, lam, rho):
            r = al_sqp.solve_batched.__wrapped__(
                nlp, cfg_w, d, z0, lam, rho
            )
            return r.status, r.inner_iters

        st, it = jax.tree.map(
            np.asarray, warm_cdf(d1, res0.z, lam0, res0.rho)
        )
        qs = np.percentile(it, [50, 90, 95, 99, 99.9, 100])
        print(
            f"warm CDF: solved {(st == 1).mean():.4f} "
            f"p50/p90/p95/p99/p999/max "
            f"{'/'.join(str(int(q)) for q in qs)}",
            flush=True,
        )

    if "benchctx" in which:
        # replicate the bench harness's full pre-warm context: the
        # cost-analysis lower/compile plus 5 staged throughput batches
        # resident on device, then measure warm — bisects the 280 ms vs
        # 198 ms discrepancy between bench.py and this tool
        try:
            ca = cold.lower(bdata).compile().cost_analysis()
            print("cost_analysis ok", flush=True)
        except Exception as e:
            print("cost_analysis failed", e, flush=True)
        batches = [
            make_batch(nlp, data, B, jax.random.PRNGKey(i + 1))
            for i in range(5)
        ]
        float(jnp.sum(batches[-1].x0))
        acc = jnp.float32(0.0)
        results = []
        for d in batches:
            r = cold(d)
            acc = acc + jnp.sum(r.z)
        float(acc)
        print("bench context staged", flush=True)

    if "sweep" in which:
        # tail-aware ladders: stage-1 capacity must hold the #lanes
        # exceeding the phase budget (CDF: >16 ~ 23%, >20 ~ 9%), and
        # the cumulative budget must pass the max (116). Winner r4:
        # b=20 + (B/8 x 48, B/32 x 192) -> 5163-5199/s at solved 1.000
        # (6 runs); b=16 variants run faster but strand 5-17% of lanes
        for wb, stages in (
            (32, ((B // 16, 128),)),              # r3 shipped config
            (16, ((B // 4, 32), (B // 16, 128))),
            (16, ((B // 8, 48), (B // 32, 192))),
            (20, ((B // 8, 48), (B // 32, 192))),  # r4 winner
            (24, ((B // 8, 96), (B // 32, 256))),
        ):
            cfg_w = dataclasses.replace(cfg, max_total=wb)

            @jax.jit
            def warm(d, z0, lam, rho):
                r = al_sqp.solve_batched_staged.__wrapped__(
                    nlp, cfg_w, d, z0, stages, lam, rho
                )
                return (
                    jnp.sum(r.z),
                    jnp.mean((r.status == 1).astype(jnp.float32)),
                    r.z, (r.lam_def, r.lam_eq, r.mu), r.rho,
                )

            s, ws, z, lam, rho = warm(d1, res0.z, lam0, res0.rho)
            float(s)
            d = d1
            t0 = time.time()
            wss = []
            iters = 5
            for i in range(iters):
                d = dataclasses.replace(d, x0=d.x0 + jnp.float32(0.01))
                s, ws, z, lam, rho = warm(d, z, lam, rho)
                wss.append(ws)
            float(s)
            t = (time.time() - t0) / iters
            ws_m = float(jnp.mean(jnp.stack(wss)))
            print(
                f"warm b={wb:3d} stages={stages}: {t*1e3:6.1f} ms "
                f"solved {ws_m:.4f} -> {B * ws_m / t:7.0f}/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
