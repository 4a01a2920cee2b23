"""Exact integer mode: batched branch-and-bound over the smooth solver.

The reference's MILP backends make declared INTEGER/BINARY variables
exactly integral via branch-and-cut (glp_intopt, eGLPK.cpp:66); these
tests check the TPU build's B&B restores that capability: integral
incumbents, correct optima vs. brute-force enumeration, and pruning by
bound on convex relaxations.
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu.core.problem import VGP
from etol_tpu.core.types import Status, VarType
from etol_tpu.solve import SolverConfig, integer_mask, solve_milp
from etol_tpu.transcribe.nlp import NLP


def _integer_reach_1d(nsteps=4, xf=3.0, xtol=0.25):
    """1D single integrator, euler (x_k = x_{k-1} + dt*u_k, the MILP
    difference-equation form), min sum u^2, INTEGER control."""
    vgp = VGP(nsteps=nsteps, dt=1.0)
    vgp.x0 = [0.0]
    vgp.xf = [xf]
    vgp.xtol = [xtol]
    vgp.xlower = [-10.0]
    vgp.xupper = [10.0]
    vgp.ulower = [-2.0]
    vgp.uupper = [2.0]
    vgp.uvartype = [VarType.INTEGER]
    nlp = NLP(
        dims=vgp.dims(),
        dynamics=lambda x, u, t, d: u,
        running_cost=lambda x, u, t, d: u[0] ** 2,
        scheme="euler",
        cost_form="sum",
        use_obstacles=False,
    )
    return vgp, nlp


def test_integer_mask_from_vartypes():
    vgp, _ = _integer_reach_1d()
    m = integer_mask(vgp)
    assert m.tolist() == [False, True]  # state continuous, control int

    vgp.xvartype = [VarType.BINARY]
    assert integer_mask(vgp).tolist() == [True, True]


def _brute_force_reach(nsteps, xf, xtol):
    """Enumerate integer control sequences; x0 pinned, euler dynamics.
    Controls act at nodes 1..nsteps (node 0's control is cost-only and
    optimally 0)."""
    best = np.inf
    for us in itertools.product(range(-2, 3), repeat=nsteps):
        x = float(np.cumsum(us)[-1])
        if abs(x - xf) <= xtol + 1e-9:
            best = min(best, float(np.sum(np.square(us))))
    return best


def test_bb_matches_brute_force():
    vgp, nlp = _integer_reach_1d(nsteps=4, xf=3.0, xtol=0.25)
    data, dims = vgp.to_device()
    cfg = SolverConfig(max_outer=16, max_inner=40)
    res = solve_milp(
        nlp, cfg, data, integer_mask(vgp), wave=8, max_nodes=128
    )
    assert res.incumbent_found
    expected = _brute_force_reach(4, 3.0, 0.25)  # = 3 (1,1,1,0)
    assert res.obj == pytest.approx(expected, abs=2e-2)
    # the incumbent's integer columns are integral
    Z = res.z.reshape(dims.nodes, dims.nx + dims.nu)
    u = Z[:, 1]
    assert np.max(np.abs(u - np.round(u))) < 2e-3
    # dynamics hold: x_k = x_{k-1} + u_k
    x = Z[:, 0]
    assert np.max(np.abs(x[1:] - x[:-1] - u[1:])) < 1e-2
    # terminal band respected
    assert abs(x[-1] - 3.0) <= 0.25 + 1e-3


def test_bb_relaxation_below_integer_optimum():
    """The integer optimum (3) is strictly above the convex relaxation
    (4*(0.75)^2 = 2.25): B&B must not return the relaxed value."""
    vgp, nlp = _integer_reach_1d(nsteps=4, xf=3.0, xtol=0.25)
    data, _ = vgp.to_device()
    cfg = SolverConfig(max_outer=16, max_inner=40)
    res = solve_milp(
        nlp, cfg, data, integer_mask(vgp), wave=8, max_nodes=128
    )
    assert res.obj > 2.5  # not the relaxation
    assert res.status == int(Status.SOLVED)
    assert res.gap <= 1e-3


def test_bb_binary_control():
    """BINARY vartype: on/off thruster. Reach 2.0+-0.25 in 5 steps with
    u in {0,1} and per-step cost u + 0.1*u*k -> prefer early burns."""
    vgp = VGP(nsteps=5, dt=1.0)
    vgp.x0 = [0.0]
    vgp.xf = [2.0]
    vgp.xtol = [0.25]
    vgp.xlower = [-5.0]
    vgp.xupper = [5.0]
    vgp.ulower = [0.0]
    vgp.uupper = [1.0]
    vgp.uvartype = [VarType.BINARY]
    nlp = NLP(
        dims=vgp.dims(),
        dynamics=lambda x, u, t, d: u,
        running_cost=lambda x, u, t, d: u[0] + 0.1 * u[0] * t,
        scheme="euler",
        cost_form="sum",
        use_obstacles=False,
    )
    data, dims = vgp.to_device()
    cfg = SolverConfig(max_outer=16, max_inner=40)
    res = solve_milp(
        nlp, cfg, data, integer_mask(vgp), wave=8, max_nodes=128
    )
    assert res.incumbent_found
    Z = res.z.reshape(dims.nodes, dims.nx + dims.nu)
    u = Z[:, 1]
    assert np.max(np.abs(u - np.round(u))) < 2e-3
    assert np.round(u[1:]).sum() == 2  # exactly two burns
    # earliest two active steps are cheapest: u at t=1,2 (cost 1.1+1.2
    # is beaten only by t=0 which is dynamics-inactive under euler)
    cost = float(res.obj)
    assert cost == pytest.approx(2.0 + 0.1 * (u[1:] * np.arange(1, 6)).sum(),
                                 abs=5e-2)


def _banded_reach():
    """Nonconvex variant: reach x=2 in 2 integer steps while the state
    may never sit in the band |x-1| < 0.2 (a 1D 'obstacle'). Integer
    optimum: burn 2 then 0 (or 0 then 2), cost 4. The continuous
    relaxation (cost ~2.1) is nonconvex -> its local values are NOT
    bounds."""
    vgp = VGP(nsteps=2, dt=1.0)
    vgp.x0 = [0.0]
    vgp.xf = [2.0]
    vgp.xtol = [0.1]
    vgp.xlower = [-5.0]
    vgp.xupper = [5.0]
    vgp.ulower = [0.0]
    vgp.uupper = [2.0]
    vgp.uvartype = [VarType.INTEGER]
    band = lambda x, u, t, d: 0.04 - (x[0] - 1.0) ** 2  # <= 0 feasible
    nlp = NLP(
        dims=vgp.dims(),
        dynamics=lambda x, u, t, d: u,
        running_cost=lambda x, u, t, d: u[0] ** 2,
        path_ineq=(band,),
        scheme="euler",
        cost_form="sum",
        use_obstacles=False,
    )
    return vgp, nlp


def test_bb_nonconvex_gates_bound_pruning():
    """VERDICT weak #8: with nonconvex constraints, a relaxation value
    is a local optimum, not a bound — bound pruning must be off by
    default (auto-detected from path_ineq/obstacles), and the search
    still finds the true integer optimum."""
    vgp, nlp = _banded_reach()
    data, _ = vgp.to_device()
    cfg = SolverConfig(max_outer=16, max_inner=40)
    res = solve_milp(
        nlp, cfg, data, integer_mask(vgp), wave=8, max_nodes=64
    )
    assert res.incumbent_found
    # true optimum: {0,2} or {2,0} -> cost 4 (brute force over u grid)
    best = np.inf
    for u1 in range(3):
        for u2 in range(3):
            x1, x2 = u1, u1 + u2
            if abs(x2 - 2.0) <= 0.1 and abs(x1 - 1.0) >= 0.2:
                best = min(best, u1**2 + u2**2)
    assert res.obj == pytest.approx(best, abs=5e-2)
    # nonconvex mode reports no (false) bound-gap certificate unless the
    # tree was exhausted
    assert np.isnan(res.gap) or res.gap == 0.0

    # forcing the convex assumption prunes at least as hard (and on a
    # problem like this may discard the optimum - which is the bug the
    # gate exists to prevent)
    res_forced = solve_milp(
        nlp, cfg, data, integer_mask(vgp), wave=8, max_nodes=64,
        convex_relaxation=True,
    )
    assert res_forced.nodes_solved <= res.nodes_solved


def test_bb_no_integer_columns_raises():
    vgp, nlp = _integer_reach_1d()
    vgp.uvartype = [VarType.CONTINUOUS]
    data, _ = vgp.to_device()
    with pytest.raises(ValueError):
        solve_milp(
            nlp, SolverConfig(), data, integer_mask(vgp), wave=4
        )
