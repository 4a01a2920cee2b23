"""Eager solver debug harness: drive single Newton/AL steps with full
per-iteration visibility (the while_loops in al_sqp hide diagnostics).

    JAX_PLATFORMS=cpu python tools/debug_solver.py <problem> [outers]

where <problem> is one of: ocp, mip, dint, uas, fw.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # a TPU-image sitecustomize may override jax_platforms via config;
    # re-assert the env var's choice before backends initialize
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from etol_tpu.models import (
    canonical_mip_2d,
    canonical_ocp_2d,
    double_integrator_2d,
    fixed_wing_3dof,
    uas_2d,
)
from etol_tpu.solve import SolverConfig
from etol_tpu.solve.al_sqp import _ALFuncs, init_multipliers

BUILDERS = {
    "ocp": canonical_ocp_2d,
    "mip": canonical_mip_2d,
    "dint": double_integrator_2d,
    "uas": uas_2d,
    "fw": fixed_wing_3dof,
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dint"
    outers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    inners = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    vgp, nlp = BUILDERS[name]()
    data, dims = vgp.to_device()
    cfg = SolverConfig()
    F = _ALFuncs(nlp, cfg, data)
    lam_def, lam_eq, mu = init_multipliers(nlp, data)
    Z = jnp.clip(nlp.initial_guess(data).reshape(F.K, F.w), F.lb, F.ub)
    rho = jnp.asarray(cfg.rho0, F.dtype)
    lm = jnp.asarray(cfg.lm0, F.dtype)

    step = jax.jit(F.newton_step)
    pgnorm = jax.jit(F.proj_grad_norm)
    gradf = jax.jit(F.al_grad)
    resid = jax.jit(F.residuals)

    for o in range(outers):
        print(f"--- outer {o}  rho={float(rho):.1e}")
        for i in range(inners):
            Z, lm, diag = step(Z, lam_def, lam_eq, mu, rho, lm)
            pgn = float(pgnorm(Z, gradf(Z, lam_def, lam_eq, mu, rho)))
            print(
                f"  it {i:2d}: val {float(diag['val0']):.6e} -> "
                f"{float(diag['val_new']):.6e}  pgn={pgn:.2e} "
                f"|p|={float(jnp.max(jnp.abs(diag['p']))):.2e} "
                f"lm={float(diag['lm']):.1e} "
                f"ls={int(diag['ls_steps'])}{'' if bool(diag['ls_ok']) else ' FAIL'}"
                f"{' FALLBACK' if bool(diag['bad']) else ''} "
                f"free={int(diag['free'].sum())}/{diag['free'].size}"
            )
            if not bool(diag["ls_ok"]) and float(diag["lm"]) >= cfg.lm_max:
                break
        lm = jnp.maximum(lm * 0.1, cfg.lm0)
        c_def, c_eq, g = resid(Z)
        viol = max(
            float(jnp.max(jnp.abs(c_def), initial=0.0)),
            float(jnp.max(jnp.abs(c_eq), initial=0.0)),
            float(jnp.max(jnp.maximum(g, 0.0), initial=0.0)),
        )
        print(f"  viol={viol:.2e}")
        lam_def = lam_def + rho * c_def
        lam_eq = lam_eq + rho * c_eq
        mu = jnp.maximum(0.0, mu + rho * g)
        if viol > 1e-4:
            rho = jnp.minimum(rho * cfg.rho_growth, cfg.rho_max)

    X = np.asarray(Z[:, : dims.nx])
    print("xN:", X[-1], " goal:", np.asarray(data.xf))


if __name__ == "__main__":
    main()
