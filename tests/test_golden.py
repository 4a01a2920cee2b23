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
    """f32 TPU-config solve vs the f64 SLSQP golden: <= 1e-3 max state
    error and matching objective."""
    import jax.numpy as jnp

    from etol_tpu.models import canonical_ocp_2d
    from etol_tpu.solve import SolverConfig, solve_multistart

    rows, note = load_golden("ocp_2d_ex1.csv")
    times_g = rows[:, 0]
    Xg = rows[:, 1:3]
    obj_g = float(note.split("obj=")[1].split(",")[0])

    vgp, nlp = canonical_ocp_2d()
    data, dims = vgp.to_device()
    res = solve_multistart(nlp, SolverConfig(), data, 8)
    assert int(res.status) == 1
    X, U = nlp.unpack(res.z)
    err = np.max(np.abs(np.asarray(X) - Xg))
    assert err <= 1e-3, f"max state error {err:.2e} vs golden ({note})"
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
