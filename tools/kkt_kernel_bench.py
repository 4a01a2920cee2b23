"""KKT kernel microbench: time pallas_bt.solve_lanes variants INSIDE a
jitted fori_loop (standalone per-call timing through the tunneled TPU
measures dispatch latency, not kernel cost — the solver calls the kernel
inside one big jitted program).

    python -u tools/kkt_kernel_bench.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/etol_jaxcache"),
)

import jax.numpy as jnp

from etol_tpu.ops import pallas_bt
from etol_tpu.solve import btridiag

B = int(os.environ.get("KB_B", "1024"))
K = int(os.environ.get("KB_K", "51"))
W = int(os.environ.get("KB_W", "5"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def main():
    A = jax.random.normal(jax.random.PRNGKey(0), (B, K, W, W), jnp.float32)
    D = jnp.einsum("bkij,bkil->bkjl", A, A) + 5.0 * jnp.eye(W)
    O = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (B, K - 1, W, W), jnp.float32
    )
    r = jax.random.normal(jax.random.PRNGKey(2), (B, K, W), jnp.float32)

    def loop_fn(refine, bt):
        def body(i, carry):
            acc, rr = carry
            x = pallas_bt.solve_lanes.__wrapped__(D, O, rr, False, refine, bt)
            # feed the result back into the next rhs so no iteration can
            # be hoisted or CSE'd
            return acc + x[0, 0, 0], rr + 1e-6 * x

        def run(r0):
            return jax.lax.fori_loop(
                0, REPS, body, (jnp.float32(0.0), r0)
            )[0]

        return jax.jit(run)

    for refine in (1, 0):
        for bt in (128, 256, 512):
            try:
                f = loop_fn(refine, bt)
                t0 = time.time()
                float(f(r))  # compile + run
                tc = time.time() - t0
                t0 = time.time()
                float(f(r))
                t1 = (time.time() - t0) / REPS * 1e3
                # accuracy check
                x = jax.jit(
                    lambda D, O, r: pallas_bt.solve_lanes.__wrapped__(
                        D, O, r, False, refine, bt
                    )
                )(D, O, r)
                res = float(jnp.max(jnp.abs(
                    r - jax.vmap(btridiag.matvec)(D, O, x)
                )))
                print(f"bt{bt:4d} refine{refine}: {t1:6.3f} ms/solve "
                      f"resid {res:.2e} (compile+1st {tc:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"bt{bt:4d} refine{refine}: FAIL {str(e)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()
