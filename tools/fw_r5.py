"""Round-5 fixed-wing campaign (VERDICT r4 #2: >= 625 solves/s/chip).

Levers measured here on-chip at B=256: the radau config (r4 measured
~10% faster than HS but shipped in a parenthesis), chord/Shamanskii
steps (obstacle-free fw trades assemblies for substeps well: 92 -> 54
p50 at +17% substeps, tools chord_fw256 run), and the trapezoidal
scheme riding the separable fast assembly (sep_assembly).

Usage: python tools/fw_r5.py [variant ...]
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
from etol_tpu.models.tuned import _TUNED
from etol_tpu.solve import SolverConfig, al_sqp


def scatter_x0(data, B, scale, dims_free, key):
    bdata = batch_tile(data, B)
    nx = bdata.x0.shape[-1]
    d = jax.random.uniform(
        key, (B, nx), minval=-scale, maxval=scale
    ).astype(jnp.float32)
    mask = jnp.zeros((nx,)).at[jnp.asarray(dims_free)].set(1.0)
    return dataclasses.replace(bdata, x0=bdata.x0 + d * mask)


def main():
    B = 256
    kkt = "pallas" if jax.default_backend() == "tpu" else "scan"
    print(f"device {jax.devices()[0].platform} kkt={kkt}", flush=True)
    vgp, nlp = fixed_wing_3dof()
    data, dims = vgp.to_device()
    bdata = scatter_x0(data, B, 0.05, [0, 1], jax.random.PRNGKey(2))
    ov, _ = _TUNED["fixed_wing_3dof"]

    def run(name, the_nlp, budget, stages, reps=3, **over):
        cfg = SolverConfig(kkt_solver=kkt, **{
            **ov, "max_total": budget, **over,
        })
        st_abs = tuple((max(B // d, 1), b) for d, b in stages)

        def go(d):
            res, trips = al_sqp.solve_batched_staged.__wrapped__(
                the_nlp, cfg, d, None, st_abs,
                return_stage_trips=True,
            )
            return (jnp.sum(res.z),
                    jnp.mean((res.status == 1).astype(jnp.float32)),
                    jnp.stack(trips),
                    jnp.sum(res.obj) / B)

        goj = jax.jit(go)
        out = goj(bdata)
        float(out[0])
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(reps):
            acc = acc + goj(bdata)[0]
        float(acc)
        t = (time.time() - t0) / reps
        sr = float(out[1])
        print(f"{name:40s} solved {sr:.4f} trips "
              f"{np.asarray(out[2]).astype(int).tolist()} obj_mean "
              f"{float(out[3]):.4f} {t*1e3:7.1f}ms -> {B*sr/t:6.0f}/s",
              flush=True)

    nlp_r = dataclasses.replace(nlp, scheme="radau")
    nlp_t = dataclasses.replace(nlp, scheme="trapezoidal")
    variants = sys.argv[1:] or ["hs", "radau", "radau_c1", "radau_c2",
                                "trap", "trap_c1"]
    for v in variants:
        if v == "hs":
            run("HS 110 + 8:96/32:512 (r4 shipped)", nlp, 110,
                ((8, 96), (32, 512)))
        elif v == "radau":
            run("radau 110 + 8:96/32:512", nlp_r, 110,
                ((8, 96), (32, 512)))
        elif v == "radau_c1":
            run("radau chord1 112 + 2:16/8:64/32:256", nlp_r, 112,
                ((2, 16), (8, 64), (32, 256)), chord_steps=1)
        elif v == "radau_c2":
            run("radau chord2 124 + 2:18/8:64/32:256", nlp_r, 124,
                ((2, 18), (8, 64), (32, 256)), chord_steps=2)
        elif v == "trap":
            run("trap sep 110 + 8:96/32:512", nlp_t, 110,
                ((8, 96), (32, 512)))
        elif v == "trap_c1":
            run("trap sep chord1 112 + 2:16/8:64/32:256", nlp_t, 112,
                ((2, 16), (8, 64), (32, 256)), chord_steps=1)


if __name__ == "__main__":
    main()
