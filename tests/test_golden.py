"""Golden-trajectory parity (BASELINE.md acceptance: <= 1e-3 state
error vs reference-grade solutions; VERDICT r2 missing #2).

Fixtures in tests/golden/ are produced by tools/make_golden_r3.py with
INDEPENDENT f64 optimizers: multistart SLSQP for the smooth canonical
OCP, and an exact HiGHS LP (on the optimal side assignment found by the
side-branching B&B) for the canonical MILP — the stand-ins for the
reference's ePSOPT/eGurobi solutions, which need solvers not installed
here (PSOPT/IPOPT, Gurobi).
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    path = os.path.join(GOLDEN, name)
    rows = np.loadtxt(path, delimiter=",", skiprows=2)
    with open(path) as fh:
        note = fh.readline()
    return rows, note


def test_ocp_golden_parity():
    """f32 TPU-config solve vs the f64 SLSQP goldens: <= 1e-3 max state
    error against the NEAREST homotopy-class fixture, and matching that
    fixture's objective.

    The canonical OCP has two legal, near-equal-cost route basins (below
    obstacle 1 / above obstacle 2 — the same ambiguity cross-backend
    comparison hits on the reference, SURVEY §4); both are committed
    (``ocp_2d_ex1.csv`` / ``ocp_2d_ex1_alt.csv``) so a solver change
    that lands in the other basin cannot fail spuriously (VERDICT r3
    weak #3)."""
    from etol_tpu.models import canonical_ocp_2d
    from etol_tpu.solve import SolverConfig, solve_multistart

    fixtures = []
    for name in ("ocp_2d_ex1.csv", "ocp_2d_ex1_alt.csv"):
        rows, note = load_golden(name)
        fixtures.append(
            (name, rows[:, 1:3],
             float(note.split("obj=")[1].split(",")[0]))
        )

    vgp, nlp = canonical_ocp_2d()
    data, dims = vgp.to_device()
    res = solve_multistart(nlp, SolverConfig(), data, 8)
    assert int(res.status) == 1
    X, U = nlp.unpack(res.z)
    X = np.asarray(X)
    errs = {n: np.max(np.abs(X - Xg)) for n, Xg, _ in fixtures}
    name, Xg, obj_g = min(fixtures, key=lambda f: errs[f[0]])
    err = errs[name]
    assert err <= 1e-3, f"max state error {err:.2e} vs both basins {errs}"
    assert float(res.obj) == pytest.approx(obj_g, abs=2e-3)


def test_mip_golden_is_feasible_and_optimal():
    """The committed MILP golden must be verifiable with pure numpy
    against the EXACT problem definition (no smooth inflation): Euler
    dynamics, epigraph rows, bounds, goal band, exact polygon-piece
    avoidance, track-square avoidance — and its objective must beat the
    12.1 ceiling (reference big-M optimum: 12,
    etol_glpk_example1.cpp:160-194)."""
    from etol_tpu.models import canonical_mip_2d

    rows, note = load_golden("mip_2d_ex1.csv")
    t = rows[:, 0]
    X = rows[:, 1:3]
    U = rows[:, 3:7]
    vgp, nlp = canonical_mip_2d()
    data, dims = vgp.to_device()
    dt = float(vgp.dt)
    K = dims.nodes

    # dynamics: x_{k+1} = x_k + dt u_{k+1}[:2] (exact, f64)
    defects = X[1:] - X[:-1] - dt * U[1:, :2]
    assert np.max(np.abs(defects)) < 1e-9

    # epigraph and bounds
    assert np.all(np.abs(U[:, 0]) <= U[:, 2] + 1e-9)
    assert np.all(np.abs(U[:, 1]) <= U[:, 3] + 1e-9)
    assert np.all(U >= np.asarray(vgp.ulower) - 1e-9)
    assert np.all(U <= np.asarray(vgp.uupper) + 1e-9)
    np.testing.assert_allclose(X[0], vgp.x0, atol=1e-9)
    assert np.all(np.abs(X[-1] - np.asarray(vgp.xf))
                  <= np.asarray(vgp.xtol) + 1e-9)

    # exact piece avoidance: no node strictly inside any convex piece
    hs = np.asarray(data.obstacles.halfspaces)
    hs_mask = np.asarray(data.obstacles.hs_mask)
    piece_mask = np.asarray(data.obstacles.piece_mask)
    for k in range(K):
        marg = hs[:, :, 2] - hs[:, :, 0] * X[k, 0] - hs[:, :, 1] * X[k, 1]
        marg = np.where(hs_mask > 0, marg, np.inf)
        depth = np.where(piece_mask > 0, marg.min(axis=1), -np.inf)
        assert depth.max() <= 1e-6, f"node {k} inside a piece"

    # track-square avoidance (the reference's NSIDES=4 approximation)
    trk_t = np.asarray(data.tracks.times)
    trk_xy = np.asarray(data.tracks.xy)
    radius = np.asarray(data.tracks.radius)
    for k in range(K):
        for i in range(trk_xy.shape[0]):
            c = np.array([
                np.interp(t[k], trk_t[i], trk_xy[i][:, d])
                for d in range(2)
            ])
            assert np.max(np.abs(X[k] - c)) >= radius[i] - 1e-6, (
                f"node {k} inside track {i} square"
            )

    # objective: the exact optimum beats the smooth build's 14-ish and
    # the VERDICT ceiling 12.1 (12 minus the goal-band slack)
    obj = float(np.sum(U[:, 2] + U[:, 3]))
    note_obj = float(note.split("obj=")[1].split(" ")[0])
    assert obj == pytest.approx(note_obj, abs=1e-6)
    assert obj <= 12.1
    assert obj >= 11.5  # sanity: not exploiting a hole in the checks


def _highs_bigm_optimum(vgp, data, dims):
    """Encode a reference-class MILP VGP (2 states, 4 controls with the
    L1 abs-epigraph pair u2/u3 as the objective, euler difference
    dynamics, polygon-piece + track-square avoidance) as the explicit
    big-M model the reference writes (addObstacleSides/addObstacleSum,
    eGLPK.cpp:190-246; NSIDES=4 squares, etol_glpk_example1.cpp:
    196-276) and return scipy HiGGS branch-and-cut's certified optimum
    — an oracle entirely outside this repo's solver code."""
    from scipy.optimize import Bounds, LinearConstraint, milp

    K, w = dims.nodes, dims.node_width
    dt = float(vgp.dt)
    M = 100.0  # coordinates are O(1..10); normals unit-scale

    hs = np.asarray(data.obstacles.halfspaces, np.float64)   # [P,H,3]
    hs_mask = np.asarray(data.obstacles.hs_mask)
    piece_mask = np.asarray(data.obstacles.piece_mask)
    trk_t = np.asarray(data.tracks.times, np.float64)
    trk_xy = np.asarray(data.tracks.xy, np.float64)
    trk_r = np.asarray(data.tracks.radius, np.float64)
    tmask = np.asarray(data.tracks.mask)

    ncont = K * w
    # binaries enumerated below: one per (node, real piece side) and
    # per (node, track, 4 square sides)
    nb = 0
    A, lb, ub = [], [], []

    def var(k, j):
        return k * w + j

    # dynamics x_k = x_{k-1} + dt * u_k (euler difference form)
    for k in range(1, K):
        for d in range(2):
            row = np.zeros(ncont)
            row[var(k, d)] = 1.0
            row[var(k - 1, d)] = -1.0
            row[var(k, 2 + d)] = -dt
            A.append(row)
            lb.append(0.0)
            ub.append(0.0)
    # epigraph |u0|<=u2, |u1|<=u3
    for k in range(K):
        for d in range(2):
            for s in (1.0, -1.0):
                row = np.zeros(ncont)
                row[var(k, 2 + d)] = s
                row[var(k, 4 + d)] = -1.0
                A.append(row)
                lb.append(-np.inf)
                ub.append(0.0)

    # big-M disjunction rows get binary columns appended after ncont
    bigm_rows = []  # (cont_row, bin_col, lb)
    group_rows = []  # (bin_cols,) sum >= 1
    for k in range(K):
        for p in range(hs.shape[0]):
            if piece_mask[p] <= 0:
                continue
            cols = []
            for m in range(hs.shape[1]):
                if hs_mask[p, m] <= 0:
                    continue
                row = np.zeros(ncont)
                row[var(k, 0)] = hs[p, m, 0]
                row[var(k, 1)] = hs[p, m, 1]
                # n.p >= b - M(1-bin)  <=>  n.p - M*bin >= b - M
                bigm_rows.append((row, nb, hs[p, m, 2] - M))
                cols.append(nb)
                nb += 1
            group_rows.append(cols)
        tk = k * dt
        for i in range(trk_xy.shape[0]):
            if tmask[i] <= 0:
                continue
            c = np.array([
                np.interp(tk, trk_t[i], trk_xy[i][:, d])
                for d in range(2)
            ])
            cols = []
            for axis, s in ((0, 1.0), (0, -1.0), (1, 1.0), (1, -1.0)):
                row = np.zeros(ncont)
                row[var(k, axis)] = s
                # s*(p-c) >= r - M(1-bin)
                bigm_rows.append((row, nb, trk_r[i] + s * c[axis] - M))
                cols.append(nb)
                nb += 1
            group_rows.append(cols)

    n = ncont + nb
    A_full, lb_full, ub_full = [], [], []
    for r, l, u in zip(A, lb, ub):
        A_full.append(np.concatenate([r, np.zeros(nb)]))
        lb_full.append(l)
        ub_full.append(u)
    for row, bcol, l in bigm_rows:
        fr = np.concatenate([row, np.zeros(nb)])
        fr[ncont + bcol] = -M
        A_full.append(fr)
        lb_full.append(l)
        ub_full.append(np.inf)
    for cols in group_rows:
        fr = np.zeros(n)
        fr[[ncont + c for c in cols]] = 1.0
        A_full.append(fr)
        lb_full.append(1.0)
        ub_full.append(np.inf)

    # variable bounds (x0 pinned, terminal band intersected)
    vlo = np.zeros(n)
    vhi = np.ones(n)
    xlo = np.asarray(vgp.xlower, np.float64)
    xhi = np.asarray(vgp.xupper, np.float64)
    ulo = np.asarray(vgp.ulower, np.float64)
    uhi = np.asarray(vgp.uupper, np.float64)
    for k in range(K):
        vlo[var(k, 0):var(k, 0) + 2] = xlo
        vhi[var(k, 0):var(k, 0) + 2] = xhi
        vlo[var(k, 2):var(k, 2) + 4] = ulo
        vhi[var(k, 2):var(k, 2) + 4] = uhi
    x0 = np.asarray(vgp.x0, np.float64)
    xf = np.asarray(vgp.xf, np.float64)
    xtol = np.asarray(vgp.xtol, np.float64)
    vlo[0:2] = vhi[0:2] = x0
    vlo[var(K - 1, 0):var(K - 1, 0) + 2] = np.maximum(xlo, xf - xtol)
    vhi[var(K - 1, 0):var(K - 1, 0) + 2] = np.minimum(xhi, xf + xtol)

    c = np.zeros(n)
    for k in range(K):
        c[var(k, 4)] = 1.0
        c[var(k, 5)] = 1.0
    integrality = np.concatenate([np.zeros(ncont), np.ones(nb)])

    res = milp(
        c,
        constraints=LinearConstraint(
            np.stack(A_full), np.array(lb_full), np.array(ub_full)
        ),
        bounds=Bounds(vlo, vhi),
        integrality=integrality,
    )
    return res


def test_mip_golden_matches_highs_milp_oracle():
    """Independent GLOBAL optimality certificate for the MILP golden
    (VERDICT r3 weak #5): encode the FULL canonical instance as the
    explicit big-M MILP and solve with scipy's HiGHS branch-and-cut
    (``scipy.optimize.milp``, the ``glp_intopt`` analog). The committed
    golden's objective must equal that certified optimum."""
    from etol_tpu.models import canonical_mip_2d

    rows, note = load_golden("mip_2d_ex1.csv")
    golden_obj = float(note.split("obj=")[1].split(" ")[0])

    vgp, nlp = canonical_mip_2d()
    data, dims = vgp.to_device()
    res = _highs_bigm_optimum(vgp, data, dims)
    assert res.status == 0, res.message
    # HiGHS's certified optimum == the committed golden's objective:
    # the side-branch B&B really did close on the global optimum
    assert golden_obj == pytest.approx(res.fun, abs=2e-3), (
        f"golden {golden_obj} vs HiGHS certified optimum {res.fun}"
    )
    assert res.fun <= 12.0  # beats the 12.1 VERDICT ceiling


def test_exact_matches_highs_on_random_instances():
    """Property-style oracle check beyond the single canonical fixture:
    randomized small reference-class instances (one box obstacle in
    varying positions/sizes blocking the line, L1 objective) must be
    closed by ``side_branch.solve_exact`` at the SAME optimum HiGHS
    branch-and-cut certifies for the explicit big-M model."""
    from etol_tpu.core.problem import VGP
    from etol_tpu.models import dynamics
    from etol_tpu.solve import SolverConfig, side_branch
    from etol_tpu.transcribe.nlp import NLP

    rng = np.random.default_rng(7)
    for trial in range(3):
        cx = float(rng.uniform(1.0, 2.0))
        cy = float(rng.uniform(-0.15, 0.15))
        half = float(rng.uniform(0.3, 0.45))
        vgp = VGP(nsteps=7, dt=0.5)
        vgp.x0 = [0.0, 0.0]
        vgp.xf = [3.0, 0.0]
        vgp.xtol = [0.05, 0.05]
        vgp.xlower = [-1.0, -2.0]
        vgp.xupper = [4.0, 2.0]
        vgp.ulower = [-1.2, -1.2, 0.0, 0.0]
        vgp.uupper = [1.2, 1.2, 1.2, 1.2]
        vgp.add_exclusion_zone(
            [[cx - half, cy - half], [cx + half, cy - half],
             [cx + half, cy + half], [cx - half, cy + half]]
        )
        nlp = NLP(
            dims=vgp.dims(),
            dynamics=dynamics.single_integrator_l1,
            running_cost=lambda x, u, t, d: u[2] + u[3],
            path_ineq=(dynamics.l1_epigraph_constraints,),
            scheme="euler",
            cost_form="sum",
        )
        data, dims = vgp.to_device()
        res = side_branch.solve_exact(
            nlp, SolverConfig(), data, wave=4, max_nodes=192,
            convex_relaxation=True,
        )
        oracle = _highs_bigm_optimum(vgp, data, dims)
        assert oracle.status == 0, oracle.message
        assert res.incumbent_found and res.certified, (
            trial, cx, cy, half, res.status, res.gap)
        assert res.status == 1
        assert res.obj == pytest.approx(oracle.fun, abs=7e-3), (
            f"trial {trial} (cx={cx:.3f} cy={cy:.3f} half={half:.3f}):"
            f" side_branch {res.obj} vs HiGHS {oracle.fun}"
        )


def test_side_branch_exact_on_small_problem():
    """Machinery smoke test at low compile cost: a tiny blocked corridor
    where the smooth-conservative route is forced wide but the exact
    side-branch threads the true boundary."""
    import jax.numpy as jnp

    from etol_tpu.core.problem import VGP
    from etol_tpu.models import dynamics
    from etol_tpu.solve import SolverConfig, side_branch
    from etol_tpu.transcribe.nlp import NLP

    vgp = VGP(nsteps=6, dt=0.5)
    vgp.x0 = [0.0, 0.0]
    vgp.xf = [3.0, 0.0]
    vgp.xtol = [0.01, 0.01]
    vgp.xlower = [-1.0, -2.0]
    vgp.xupper = [4.0, 2.0]
    vgp.ulower = [-1.5, -1.5]
    vgp.uupper = [1.5, 1.5]
    # square blocking the straight line
    vgp.add_exclusion_zone(
        [[1.2, -0.4], [1.8, -0.4], [1.8, 0.4], [1.2, 0.4]]
    )
    nlp = NLP(
        dims=vgp.dims(),
        dynamics=dynamics.single_integrator,
        running_cost=lambda x, u, t, d: u[0] ** 2 + u[1] ** 2,
        scheme="euler",
        cost_form="sum",
    )
    data, dims = vgp.to_device()
    res = side_branch.solve_exact(
        nlp, SolverConfig(), data, wave=4, max_nodes=64
    )
    assert res.incumbent_found
    assert res.status == 1  # tree closed: exact
    X = res.z.reshape(dims.nodes, -1)[:, :2]
    # endpoint reached
    assert np.max(np.abs(X[-1] - [3.0, 0.0])) <= 0.011
    # no node inside the (single-piece) obstacle deeper than the B&B's
    # inside_eps (node-wise semantics, exactly like the reference MILP:
    # nodes may touch the boundary; inter-node segments are not
    # constrained, eGLPK addObstacleSides rows are per timestep)
    eps = 2e-3
    inside = (
        (X[:, 0] > 1.2 + eps) & (X[:, 0] < 1.8 - eps)
        & (X[:, 1] > -0.4 + eps) & (X[:, 1] < 0.4 - eps)
    )
    assert not inside.any(), X


def test_exact_infeasible_certificate_vs_uncertified():
    """Advisor r3 (medium): budget exhaustion must never be treated as
    an infeasibility certificate. On a provably infeasible problem
    (goal 10 units away, max reach 1.0):

    * with warm retries, the engine earns a STAGNATION certificate (a
      full warm retry fails to halve the violation of the convex
      relaxation) -> INFEASIBLE with certified=True;
    * with max_retries=0 the node is dropped WITHOUT a certificate ->
      certified=False (the uncertified-truncation flag)."""
    from etol_tpu.core.problem import VGP
    from etol_tpu.models import dynamics
    from etol_tpu.solve import SolverConfig, side_branch
    from etol_tpu.transcribe.nlp import NLP

    vgp = VGP(nsteps=4, dt=0.5)
    vgp.x0 = [0.0, 0.0]
    vgp.xf = [10.0, 0.0]
    vgp.xtol = [0.01, 0.01]
    vgp.xlower = [-20.0, -20.0]
    vgp.xupper = [20.0, 20.0]
    vgp.ulower = [-0.5, -0.5]
    vgp.uupper = [0.5, 0.5]
    nlp = NLP(
        dims=vgp.dims(),
        dynamics=dynamics.single_integrator,
        running_cost=lambda x, u, t, d: u[0] ** 2 + u[1] ** 2,
        scheme="euler",
        cost_form="sum",
        use_obstacles=False,
    )
    data, dims = vgp.to_device()
    cfg = SolverConfig(max_total=150)

    res = side_branch.solve_exact(
        nlp, cfg, data, wave=2, max_nodes=16, max_retries=2
    )
    assert not res.incumbent_found
    assert res.status == 3  # INFEASIBLE
    assert res.certified  # stagnation certificate earned via retries

    res0 = side_branch.solve_exact(
        nlp, cfg, data, wave=2, max_nodes=16, max_retries=0
    )
    assert not res0.incumbent_found
    assert not res0.certified  # dropped with no certificate


def test_exact_composes_binary_param_with_obstacle():
    """VERDICT r3 missing #2: a VGP with a BINARY param AND an obstacle
    must solve exactly in ONE search (the reference's single GLPK model
    holds per-window binaries and per-edge obstacle binaries together,
    etol_glpk_example1.cpp:160-276). The 'boost' binary b gates the
    speed limit (|u| <= 0.35 + 1.15 b at cost 0.4 b); the horizon is too
    short to reach the goal at base speed, so the relaxation picks a
    fractional b (integer branching) while the obstacle blocks the
    straight line (side branching) — both binary families resolved by
    the same certified tree. The instance is the shared
    :func:`etol_tpu.models.composed_exact_demo` (also the
    ``etol-solve-exact`` example)."""
    from etol_tpu.models import composed_exact_demo
    from etol_tpu.solve import SolverConfig, integer_mask, side_branch

    vgp, nlp = composed_exact_demo()
    data, dims = vgp.to_device()
    res = side_branch.solve_exact(
        nlp, SolverConfig(), data, wave=4, max_nodes=64,
        # the demo's rows are linear (models/problems.py) — opt in to
        # bound pruning; the default now auto-detects conservatively
        convex_relaxation=True,
    )
    assert res.incumbent_found
    assert res.status == 1  # tree closed: exact
    X = res.z.reshape(dims.nodes, -1)[:, :2]
    # endpoint reached within the demo's goal band (xtol = 0.02) plus
    # f32 slack — the optimum legitimately sits ON the band edge
    assert np.max(np.abs(X[-1] - [3.0, 0.0])) <= 0.021
    # no node inside the (single-piece) obstacle deeper than the B&B's
    # inside_eps (node-wise semantics, exactly like the reference MILP:
    # nodes may touch the boundary; inter-node segments are not
    # constrained, eGLPK addObstacleSides rows are per timestep)
    eps = 2e-3
    inside = (
        (X[:, 0] > 1.2 + eps) & (X[:, 0] < 1.8 - eps)
        & (X[:, 1] > -0.4 + eps) & (X[:, 1] < 0.4 - eps)
    )
    assert not inside.any(), X


def test_exact_composes_binary_param_with_obstacle_explicit():
    """Same composition as
    :func:`test_exact_composes_binary_param_with_obstacle` but with the
    VGP/NLP constructed inline (not via models.composed_exact_demo) and
    convex_relaxation passed explicitly — guards the engine
    independently of the shared demo model. (These two were shadowed
    duplicates through r4 — VERDICT r4 weak #3; now both run.)"""
    import jax.numpy as jnp

    from etol_tpu.core.problem import VGP
    from etol_tpu.core.types import ParamConfig, VarType
    from etol_tpu.models import dynamics
    from etol_tpu.solve import SolverConfig, integer_mask, side_branch
    from etol_tpu.transcribe.nlp import NLP

    vgp = VGP(nsteps=6, dt=0.5)
    vgp.x0 = [0.0, 0.0]
    vgp.xf = [3.0, 0.0]
    vgp.xtol = [0.02, 0.02]
    vgp.xlower = [-1.0, -2.0]
    vgp.xupper = [4.0, 2.0]
    vgp.ulower = [-1.5, -1.5]
    vgp.uupper = [1.5, 1.5]
    vgp.add_exclusion_zone(
        [[1.2, -0.4], [1.8, -0.4], [1.8, 0.4], [1.2, 0.4]]
    )
    vgp.add_params(
        {"boost": ParamConfig(VarType.BINARY, 0.0, 1.0, 0.0, 3.0)}
    )

    def cost(x, u, t, d, p):
        return u[0] ** 2 + u[1] ** 2 + 0.4 * p[0]

    def speed_gate(x, u, t, d, p):
        cap = 0.35 + 1.15 * p[0]
        return jnp.stack([u[0] - cap, -u[0] - cap,
                          u[1] - cap, -u[1] - cap])

    nlp = NLP(
        dims=vgp.dims(),
        dynamics=dynamics.single_integrator,
        running_cost=cost,
        path_ineq=(speed_gate,),
        scheme="euler",
        cost_form="sum",
    )
    data, dims = vgp.to_device()
    res = side_branch.solve_exact(
        nlp, SolverConfig(), data,
        int_cols=integer_mask(vgp),
        wave=8, max_nodes=384,
        convex_relaxation=True,  # linear dynamics/rows + convex cost
    )
    assert res.incumbent_found
    assert res.certified
    assert res.status == 1  # tree closed: certified exact
    Z = res.z.reshape(dims.nodes, dims.node_width)
    X, B = Z[:, :2], Z[:, 4]
    # the binary resolved integral — and to 1 (base speed cannot reach)
    assert np.max(np.abs(B - np.round(B))) < 2e-3
    assert np.round(B[1:]).max() == 1
    # endpoint reached, obstacle threaded exactly (node semantics)
    assert np.max(np.abs(X[-1] - [3.0, 0.0])) <= 0.021
    eps = 2e-3
    inside = (
        (X[:, 0] > 1.2 + eps) & (X[:, 0] < 1.8 - eps)
        & (X[:, 1] > -0.4 + eps) & (X[:, 1] < 0.4 - eps)
    )
    assert not inside.any(), X


def test_stagnation_counter_resets_on_improvement():
    """The infeasibility certificate demands two CONSECUTIVE
    non-halving retries; a retry that halves the violation must reset
    the run (else a slowly-converging feasible node could be pruned
    with certified=True — r5 review finding)."""
    from etol_tpu.solve.side_branch import _next_stagn

    # stagnant retries extend the run
    assert _next_stagn(0, True) == 1
    assert _next_stagn(1, True) == 2
    # an improving retry resets it — the sequence
    # stagnant, improving, stagnant never reaches 2
    s = 0
    for stagnant in (True, False, True):
        s = _next_stagn(s, stagnant)
    assert s == 1
