"""Fleet-scale batched solving: thousands of UAS guidance problems at
once (BASELINE.json config 5 direction), sharded over all visible devices.

    python examples/fleet_batch.py [batch]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax

if os.environ.get("JAX_PLATFORMS"):
    # TPU-image sitecustomize may override jax_platforms via config;
    # re-assert the env var's choice before backends initialize
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


import jax
import jax.numpy as jnp
import numpy as np

from etol_tpu import batch_tile
from etol_tpu.models import uas_2d
from etol_tpu.parallel import make_mesh, solve_sharded
from etol_tpu.solve import SolverConfig

def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    key = jax.random.PRNGKey(0)
    x0 = jnp.concatenate(
        [jax.random.uniform(key, (B, 2), minval=-0.5, maxval=0.5),
         jnp.zeros((B, 1))], axis=1,
    ).astype(jnp.float32)
    bdata = dataclasses.replace(bdata, x0=x0)

    mesh = make_mesh()
    cfg = SolverConfig(max_outer=8, max_inner=20)
    t0 = time.time()
    res = solve_sharded(nlp, cfg, bdata, mesh)
    jax.block_until_ready(res.z)
    t_first = time.time() - t0
    t0 = time.time()
    res = solve_sharded(nlp, cfg, bdata, mesh)
    jax.block_until_ready(res.z)
    t_warm = time.time() - t0

    status = np.asarray(res.status)
    print(f"devices: {len(jax.devices())}  batch: {B}")
    print(f"solved: {(status == 1).mean()*100:.1f}%  "
          f"max viol: {float(np.max(np.asarray(res.viol_eq))):.1e}")
    print(f"first (compile): {t_first:.1f}s  warm: {t_warm*1e3:.0f}ms  "
          f"-> {B/t_warm:.0f} solves/s")


if __name__ == "__main__":
    main()
