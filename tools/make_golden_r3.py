"""Generate golden-trajectory fixtures (VERDICT r2 missing #2).

BASELINE.md's acceptance criterion is "<= 1e-3 state error vs
ePSOPT/eGurobi reference solutions". The reference binaries are not
runnable here (their solvers aren't installed), so the goldens are
produced by INDEPENDENT optimizers in float64:

* ocp_2d_ex1 — the smooth canonical VGP exactly as the reference's NLP
  examples pose it (ellipse obstacles, trapezoidal transcription):
  scipy SLSQP in f64 from multiple starts (the best feasible local
  optimum), polished to ftol 1e-12. SLSQP shares no code with the
  AL-SQP under test.
* mip_2d_ex1 — the MILP canonical VGP: the side-branching B&B
  (solve/side_branch.py) finds the optimal escape-side assignment;
  the assignment's remaining problem is a pure LP, which scipy
  linprog/HiGHS then solves EXACTLY in f64 (simplex — no tolerance
  slack). HiGHS is the stand-in for the reference's GLPK
  (eGLPK.cpp:66); the optimal value must match the reference's 12
  up to the goal-tolerance band.

Run:  JAX_PLATFORMS=cpu python -u tools/make_golden_r3.py
Writes tests/golden/{ocp_2d_ex1,mip_2d_ex1}.csv
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linprog, minimize

from etol_tpu.models import canonical_mip_2d, canonical_ocp_2d
from etol_tpu.solve import SolverConfig, side_branch, solve as al_solve

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)


def save_csv(path, times, X, U, header_note):
    K = X.shape[0]
    cols = ["time"] + [f"x{i}" for i in range(X.shape[1])] + [
        f"u{i}" for i in range(U.shape[1])
    ]
    with open(path, "w") as fh:
        fh.write(f"# {header_note}\n")
        fh.write(",".join(cols) + "\n")
        for k in range(K):
            row = [times[k]] + list(X[k]) + list(U[k])
            fh.write(",".join(f"{v:.12g}" for v in row) + "\n")
    print("wrote", path)


def golden_ocp():
    vgp, nlp = canonical_ocp_2d()
    data, dims = vgp.to_device(dtype=jnp.float64)
    lb, ub = jax.jit(nlp.bounds)(data)
    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)

    obj = jax.jit(nlp.objective)
    gobj = jax.jit(jax.grad(nlp.objective))
    ceq = jax.jit(nlp.eq_residuals)
    jeq = jax.jit(jax.jacfwd(nlp.eq_residuals))
    cin = jax.jit(nlp.ineq_residuals)
    jin = jax.jit(jax.jacfwd(nlp.ineq_residuals))

    K, w = dims.nodes, dims.nx + dims.nu
    base = np.asarray(nlp.initial_guess(data), np.float64)

    # multistart: nominal, half-sine y-bumps in both directions, and
    # the native AL-SQP solution (f64) as a polish start — SLSQP then
    # certifies/locates the best local optimum across all basins in f64
    res32 = al_solve(nlp, SolverConfig(), data)
    starts = [base, np.asarray(res32.z, np.float64)]
    for amp in (-1.5, -0.75, 0.75, 1.5):
        for b0 in (base, starts[1]):
            Z = b0.reshape(K, w).copy()
            bump = amp * np.sin(np.pi * np.arange(K) / (K - 1))
            Z[:, 1] = Z[:, 1] + bump
            starts.append(Z.reshape(-1))

    # the obstacle field splits feasible trajectories into two route
    # homotopy classes (above / below the straight line) of nearly equal
    # cost; keep the best solution in EACH so the parity test can match
    # whichever basin the solver lands in (cross-backend comparison on
    # the reference has the same ambiguity)
    def basin(z):
        Z = z.reshape(K, w)
        line = np.interp(
            Z[:, 0], [vgp.x0[0], vgp.xf[0]], [vgp.x0[1], vgp.xf[1]]
        )
        return 1 if float(np.mean(Z[:, 1] - line)) >= 0 else -1

    best = {}
    for z0 in starts:
        out = minimize(
            lambda z: float(obj(z, data)),
            z0,
            jac=lambda z: np.asarray(gobj(z, data), np.float64),
            constraints=[
                {"type": "eq",
                 "fun": lambda z: np.asarray(ceq(z, data), np.float64),
                 "jac": lambda z: np.asarray(jeq(z, data), np.float64)},
                {"type": "ineq",
                 "fun": lambda z: -np.asarray(cin(z, data), np.float64),
                 "jac": lambda z: -np.asarray(jin(z, data), np.float64)},
            ],
            bounds=list(zip(lb, ub)),
            method="SLSQP",
            options={"maxiter": 500, "ftol": 1e-12},
        )
        feas = max(
            float(np.max(np.abs(ceq(out.x, data)))),
            float(np.max(np.maximum(np.asarray(cin(out.x, data)), 0.0))),
        )
        print(f"  SLSQP start: obj={out.fun:.6f} feas={feas:.2e} "
              f"ok={out.success}")
        if feas < 1e-8:
            b = basin(out.x)
            if b not in best or out.fun < best[b][0]:
                best[b] = (out.fun, out.x)
    assert best, "no feasible SLSQP solution"
    times = np.arange(K) * float(vgp.dt)
    objs = []
    order = sorted(best, key=lambda b: best[b][0])
    for rank, b in enumerate(order):
        objv, z = best[b]
        Z = z.reshape(K, w)
        name = "ocp_2d_ex1.csv" if rank == 0 else "ocp_2d_ex1_alt.csv"
        save_csv(
            os.path.join(GOLDEN_DIR, name),
            times, Z[:, : dims.nx], Z[:, dims.nx :],
            f"golden ocp_2d_ex1 ({'above' if b > 0 else 'below'} "
            f"route): f64 multistart SLSQP, obj={objv:.9f}, feas<1e-8 "
            f"(tools/make_golden_r3.py)",
        )
        objs.append(objv)
    return objs[0]


def golden_mip():
    vgp, nlp = canonical_mip_2d()
    # f32 side-branch finds the optimal side assignment...
    data32, dims = vgp.to_device(dtype=jnp.float32)
    cfg = SolverConfig()
    res = side_branch.solve_exact(
        nlp, cfg, data32, wave=16, max_nodes=512, verbose=True
    )
    assert res.incumbent_found and res.status == 1

    # ...then recover the assignment from the incumbent and solve the
    # fixed-assignment LP EXACTLY with HiGHS in f64.
    K, w = dims.nodes, dims.nx + dims.nu
    Z = np.asarray(res.z, np.float64).reshape(K, w)
    data, _ = vgp.to_device(dtype=jnp.float64)
    hs = np.asarray(data.obstacles.halfspaces, np.float64)  # [P, H, 3]
    hs_mask = np.asarray(data.obstacles.hs_mask)
    piece_mask = np.asarray(data.obstacles.piece_mask)
    P, H, _ = hs.shape
    trk_t = np.asarray(data.tracks.times, np.float64)
    trk_xy = np.asarray(data.tracks.xy, np.float64)
    radius = np.asarray(data.tracks.radius, np.float64)
    tmask = np.asarray(data.tracks.mask)
    T = trk_xy.shape[0]
    dt = float(vgp.dt)

    # decision vector [K, w] flat: x(2), u0..u3
    nz = K * w
    idx = lambda k, j: k * w + j

    lb = np.full(nz, -np.inf)
    ub = np.full(nz, np.inf)
    for k in range(K):
        for j in range(2):
            lb[idx(k, j)] = vgp.xlower[j]
            ub[idx(k, j)] = vgp.xupper[j]
        for j in range(4):
            lb[idx(k, 2 + j)] = vgp.ulower[j]
            ub[idx(k, 2 + j)] = vgp.uupper[j]
    # x0 pin (rhorizon=1) and goal band
    for j in range(2):
        lb[idx(0, j)] = ub[idx(0, j)] = vgp.x0[j]
        lb[idx(K - 1, j)] = vgp.xf[j] - vgp.xtol[j]
        ub[idx(K - 1, j)] = vgp.xf[j] + vgp.xtol[j]

    A_eq, b_eq = [], []
    # euler defects x_{k+1} = x_k + dt*u_{k+1}(first 2) — matches
    # scheme="euler" (step_defect uses the step-end control, the MILP
    # difference-equation form x_k = x_{k-1} + dt u_k,
    # etol_glpk_example1.cpp:113-120)
    for k in range(K - 1):
        for j in range(2):
            row = np.zeros(nz)
            row[idx(k + 1, j)] = 1.0
            row[idx(k, j)] = -1.0
            row[idx(k + 1, 2 + j)] = -dt
            A_eq.append(row)
            b_eq.append(0.0)

    A_ub, b_ub = [], []
    # epigraph |u0|<=u2, |u1|<=u3
    for k in range(K):
        for (a, b) in ((0, 2), (1, 3)):
            for s in (1.0, -1.0):
                row = np.zeros(nz)
                row[idx(k, 2 + a)] = s
                row[idx(k, 2 + b)] = -1.0
                A_ub.append(row)
                b_ub.append(0.0)
    # side assignment rows from the incumbent geometry: for every
    # (k, piece) pick the deepest-satisfied side of the incumbent; for
    # every (k, track) likewise (recovering sel from z is exact — the
    # incumbent is feasible for its own assignment)
    for k in range(K):
        p = Z[k, :2]
        for j in range(P):
            if piece_mask[j] <= 0:
                continue
            marg = hs[j, :, 2] - hs[j, :, 0] * p[0] - hs[j, :, 1] * p[1]
            marg = np.where(hs_mask[j] > 0, marg, np.inf)
            if marg.min() > 1e-6:
                raise RuntimeError("incumbent inside piece")
            m = int(np.argmin(marg))
            # enforce n.p >= b: -n.p <= -b
            row = np.zeros(nz)
            row[idx(k, 0)] = -hs[j, m, 0]
            row[idx(k, 1)] = -hs[j, m, 1]
            A_ub.append(row)
            b_ub.append(-hs[j, m, 2])
        t = k * dt
        for i in range(T):
            if tmask[i] <= 0:
                continue
            c = np.array([
                np.interp(t, trk_t[i], trk_xy[i][:, d])
                for d in range(2)
            ])
            d2 = p - c
            sides = np.array([d2[0], -d2[0], d2[1], -d2[1]])
            if sides.max() < radius[i] - 1e-6:
                raise RuntimeError("incumbent inside track square")
            m = int(np.argmax(sides))
            nvec = [(1, 0), (-1, 0), (0, 1), (0, -1)][m]
            # n.(p - c) >= r  ->  -n.p <= -r - n.c
            row = np.zeros(nz)
            row[idx(k, 0)] = -nvec[0]
            row[idx(k, 1)] = -nvec[1]
            A_ub.append(row)
            b_ub.append(-radius[i] - nvec[0] * c[0] - nvec[1] * c[1])

    c = np.zeros(nz)
    for k in range(K):
        c[idx(k, 2 + 2)] = 1.0
        c[idx(k, 2 + 3)] = 1.0

    out = linprog(
        c, A_ub=np.asarray(A_ub), b_ub=np.asarray(b_ub),
        A_eq=np.asarray(A_eq), b_eq=np.asarray(b_eq),
        bounds=list(zip(lb, ub)), method="highs",
    )
    assert out.status == 0, out.message
    print(f"  HiGHS LP on incumbent assignment: obj={out.fun:.9f} "
          f"(side-branch f32 said {res.obj:.6f})")
    Zlp = out.x.reshape(K, w)
    times = np.arange(K) * dt
    save_csv(
        os.path.join(GOLDEN_DIR, "mip_2d_ex1.csv"),
        times, Zlp[:, :2], Zlp[:, 2:],
        f"golden mip_2d_ex1: exact HiGHS LP on the optimal side "
        f"assignment (side-branch B&B), obj={out.fun:.9f} "
        f"(tools/make_golden_r3.py; reference big-M optimum 12, "
        f"etol_glpk_example1.cpp)",
    )
    return out.fun


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    print("ocp golden:")
    o1 = golden_ocp()
    print("mip golden:")
    o2 = golden_mip()
    print(f"done: ocp obj {o1:.6f}, mip obj {o2:.6f}")
