"""Time-delayed states/controls (true rhorizon).

Parity target: ePSOPT get_delayed_state/get_delayed_control
(ePSOPT.cpp:231-248) and the eSCIP rhorizon-deep variable window
(eSCIP.cpp:355-375). A delayed NLP declares x_delay/u_delay; its
dynamics receives fixed-shape history windows ending at the current
node, with pre-horizon history clamped to node 0.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from etol_tpu.core.problem import VGP
from etol_tpu.core.types import Status
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.transcribe.nlp import NLP


def _delayed_vgp(nsteps=20, dt=0.5, u_delay=2):
    """1-D integrator with control latency: xdot(t) = u(t - u_delay*dt),
    min sum u^2."""
    vgp = VGP(nsteps=nsteps, dt=dt)
    vgp.x_rhorizon = 1
    vgp.u_rhorizon = u_delay
    vgp.x0 = [0.0]
    vgp.xf = [2.0]
    vgp.xtol = [0.02]
    vgp.xlower = [-10.0]
    vgp.xupper = [10.0]
    vgp.ulower = [-2.0]
    vgp.uupper = [2.0]
    dims = vgp.dims()

    def dyn(xw, uw, t, data):
        # xw [1, 1] (x_delay=0 -> current only), uw [u_delay+1, 1]:
        # oldest row = u(t - u_delay*dt)
        return uw[0]

    def cost(x, u, t, data):
        return u[0] ** 2

    nlp = NLP(
        dims=dims,
        dynamics=dyn,
        running_cost=cost,
        scheme="euler",
        cost_form="sum",
        use_obstacles=False,
        x_delay=0,
        u_delay=u_delay,
    )
    return vgp, nlp


def test_step_windows_clamp():
    vgp, nlp = _delayed_vgp(nsteps=4, u_delay=2)
    Z = jnp.arange(5.0)[:, None] * jnp.ones((1, 2))
    W = nlp.step_windows(Z)
    assert W.shape == (4, 4, 2)  # [nsteps, delay+2, w]
    # window 0 covers nodes -2, -1, 0, 1 with history clamped to node 0
    np.testing.assert_array_equal(np.asarray(W[0, :, 0]), [0, 0, 0, 1])
    # window 3 covers nodes 1..4
    np.testing.assert_array_equal(np.asarray(W[3, :, 0]), [1, 2, 3, 4])


def test_pair_defect_matches_step_defect_when_memoryless():
    vgp, nlp = _delayed_vgp(nsteps=6, u_delay=0)
    nlp0 = dataclasses.replace(
        nlp,
        x_delay=0,
        u_delay=0,
        dynamics=lambda x, u, t, data: u,
    )
    data, dims = vgp.to_device()
    z = nlp0.initial_guess(data) + 0.1
    Z = z.reshape(dims.nodes, -1)
    k = jnp.int32(2)
    a = nlp0.pair_defect(jnp.stack([Z[2], Z[3]]), k, data)
    b = nlp0.step_defect(Z[2], Z[3], k, data)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_delayed_solve_feasible_and_optimal():
    u_delay, nsteps, dt = 2, 20, 0.5
    vgp, nlp = _delayed_vgp(nsteps=nsteps, dt=dt, u_delay=u_delay)
    data, dims = vgp.to_device()
    res = solve(nlp, SolverConfig(), data)
    assert int(res.status) == int(Status.SOLVED)
    X, U = nlp.unpack(res.z)
    X, U = np.asarray(X)[:, 0], np.asarray(U)[:, 0]

    # manual rollout of the delayed difference equation (euler:
    # x_{k+1} = x_k + dt * u_{k+1-u_delay}, clamped at node 0)
    x = np.zeros(nsteps + 1)
    for k in range(nsteps):
        j = max(k + 1 - u_delay, 0)
        x[k + 1] = x[k] + dt * U[j]
    # per-step defect tolerance (1e-4 state units) accumulates over the
    # rollout; this checks the delay *semantics*, not solver tightness
    np.testing.assert_allclose(X, x, atol=2e-2)
    assert abs(X[-1] - 2.0) <= 0.03

    # optimality: the last u_delay controls arrive too late to move the
    # state — an optimal solution leaves them at ~0
    assert np.all(np.abs(U[-u_delay:]) < 0.05)

    # analytic optimum: u_0 applies twice (pre-horizon clamp), u_1..u_18
    # once; minimizing sum u^2 s.t. sum(applications)*dt = 2 gives
    # cost = (2/dt)^2 / sum(c_j^2) = 16/22 ~ 0.727 (xtol shaves ~2%)
    assert 0.66 <= float(res.obj) <= 0.76

    nlp0 = dataclasses.replace(
        nlp,
        x_delay=0,
        u_delay=0,
        dynamics=lambda x, u, t, data: u,
    )
    res0 = solve(nlp0, SolverConfig(), data)
    assert int(res0.status) == int(Status.SOLVED)
    # the double-counted first control makes the delayed optimum
    # slightly CHEAPER than the memoryless one (0.727 vs 0.8)
    assert float(res.obj) <= float(res0.obj) + 1e-3


def test_delayed_state_window():
    """x_delay > 0: dynamics sees past states (discrete delay ODE
    xdot = -a x(t - d) + u)."""
    nsteps, dt, x_delay = 16, 0.25, 2
    vgp = VGP(nsteps=nsteps, dt=dt)
    vgp.x_rhorizon = x_delay
    vgp.x0 = [1.0]
    vgp.xf = [0.0]
    vgp.xtol = [0.05]
    vgp.xlower = [-5.0]
    vgp.xupper = [5.0]
    vgp.ulower = [-3.0]
    vgp.uupper = [3.0]
    dims = vgp.dims()
    assert dims.rhorizon == x_delay

    def dyn(xw, uw, t, data):
        return -0.8 * xw[0] + uw[0]

    nlp = NLP(
        dims=dims,
        dynamics=dyn,
        running_cost=lambda x, u, t, data: u[0] ** 2,
        scheme="euler",
        cost_form="sum",
        use_obstacles=False,
        x_delay=x_delay,
        u_delay=0,
    )
    data, _ = vgp.to_device()
    res = solve(nlp, SolverConfig(), data)
    assert int(res.status) == int(Status.SOLVED)
    X, U = nlp.unpack(res.z)
    X, U = np.asarray(X)[:, 0], np.asarray(U)[:, 0]
    # rollout check: x_{k+1} = x_k + dt*(-0.8 x_{k+1-d (clamped)} + u_{k+1})
    x = np.full(nsteps + 1, 1.0)
    for k in range(nsteps):
        j = max(k + 1 - x_delay, 0)
        x[k + 1] = x[k] + dt * (-0.8 * x[j] + U[k + 1])
    # the first x_delay nodes are pinned to x0 by the rhorizon bounds
    np.testing.assert_allclose(X[:x_delay], 1.0, atol=1e-6)
    np.testing.assert_allclose(X[x_delay:], x[x_delay:], atol=7e-3)
    assert abs(X[-1]) <= 0.06
