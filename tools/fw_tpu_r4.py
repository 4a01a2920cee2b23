"""Round-4 fixed-wing TPU wall-time experiments (VERDICT r3 do #1).

CPU diagnosis (tools/fw_diag_r4.py) showed the iteration CDF is
p50~92/p99~103 at rho0=316 (NOT the ~400 the r3 PARITY note claimed),
so the 117 solves/s rung is per-iteration-cost bound (~17 ms/iter at
B=256, w=9, K=101). Each variant here attacks wall time per iteration:
radau residuals (1 stage eval vs Hermite-Simpson's midpoint chain),
smaller parallel line-search grid, larger batch.

Run on the TPU: python tools/fw_tpu_r4.py [variant ...]
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

from etol_tpu import batch_tile
from etol_tpu.models import fixed_wing_3dof
from etol_tpu.solve import SolverConfig, al_sqp


def scatter_x0(data, B, scale, dims_free, key):
    bdata = batch_tile(data, B)
    nx = bdata.x0.shape[-1]
    d = jax.random.uniform(
        key, (B, nx), minval=-scale, maxval=scale
    ).astype(jnp.float32)
    mask = jnp.zeros((nx,)).at[jnp.asarray(dims_free)].set(1.0)
    return dataclasses.replace(bdata, x0=bdata.x0 + d * mask)


def run(name, nlp, bdata, cfg, stages, reps=3):
    B = bdata.x0.shape[0]

    def go(d):
        res = al_sqp.solve_batched_staged.__wrapped__(
            nlp, cfg, d, None, stages
        )
        return (
            jnp.sum(res.z),
            jnp.mean((res.status == 1).astype(jnp.float32)),
            jnp.max(jnp.maximum(res.viol_eq, res.viol_in)),
            jnp.max(res.inner_iters),
        )

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
    sps = B * solved / t
    print(
        f"{name:44s} B={B:5d} solved {solved:.3f} viol "
        f"{float(out[2]):.1e} trips {int(out[3]):4d} "
        f"{t*1e3:7.1f} ms -> {sps:7.0f}/s (compile {tc:.0f}s)",
        flush=True,
    )
    return sps


def main():
    variants = sys.argv[1:] or ["r3", "tuned", "radau", "radau_ls16",
                                "radau_b1024"]
    dev = jax.devices()[0]
    kkt = "pallas" if jax.default_backend() == "tpu" else "scan"
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    vgp, nlp = fixed_wing_3dof()
    data, dims = vgp.to_device()
    nlp_r = dataclasses.replace(nlp, scheme="radau")
    key = jax.random.PRNGKey(2)

    def bd(B):
        return scatter_x0(data, B, 0.05, [0, 1], key)

    cfg_r3 = SolverConfig(
        max_outer=64, rho0=10.0, kkt_solver=kkt, lm_rule="ratio",
        round_viol_patience=8, max_total=400,
    )
    cfg316 = dataclasses.replace(cfg_r3, rho0=316.0, max_total=110)
    cfg316_ls16 = dataclasses.replace(
        cfg316, ls_grid=16, ls_backtracks=16
    )

    for v in variants:
        if v == "r3":
            run("r3 ladder (rho10, 400 + 400/2000)", nlp, bd(256),
                cfg_r3, ((128, 400), (32, 2000)))
        elif v == "tuned":
            run("rho316 p8, 110 + 96/512", nlp, bd(256), cfg316,
                ((32, 96), (8, 512)))
        elif v == "radau":
            run("radau rho316, 110 + 96/512", nlp_r, bd(256), cfg316,
                ((32, 96), (8, 512)))
        elif v == "radau_ls16":
            run("radau rho316 ls16", nlp_r, bd(256), cfg316_ls16,
                ((32, 96), (8, 512)))
        elif v == "radau_b1024":
            run("radau rho316 ls16 B=1024", nlp_r, bd(1024),
                cfg316_ls16, ((128, 96), (32, 512)))
        elif v == "radau_b512":
            run("radau rho316 ls16 B=512", nlp_r, bd(512),
                cfg316_ls16, ((64, 96), (16, 512)))
        elif v == "gn":
            # CPU iteration CDF says gn is slightly BETTER on fw at
            # rho316 (p50 84 vs 92) and skips the 18x18 pair-Hessians,
            # but the remote TPU compile helper reproducibly SIGSEGVs
            # on this program (HTTP 500, tpu_compile_helper signal 11,
            # 2x on 2026-08-21) — parked until the toolchain moves
            run("HS rho316 gn-hessian", nlp, bd(256),
                dataclasses.replace(cfg316, hessian="gn",
                                    max_total=100),
                ((32, 96), (8, 512)))
        elif v == "hs_b1024":
            run("HS rho316 ls16 B=1024", nlp, bd(1024),
                dataclasses.replace(cfg316, ls_grid=16,
                                    ls_backtracks=16),
                ((128, 96), (32, 512)))
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
