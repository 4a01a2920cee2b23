"""Auxiliary ("param") decision variables: masked dense columns.

Parity target: param_configs_t (ETOL_Types.hpp:40-46) + the per-window
variable creation of eGLPK (eGLPK.cpp:275-332). A param is an extra
per-node decision column with its own bounds, active only inside its
[t_start, t_stop] window (pinned to 0 outside), visible to user cost
and path-constraint callbacks as a trailing argument.
"""
import jax.numpy as jnp
import numpy as np

from etol_tpu.core.problem import VGP
from etol_tpu.core.types import ParamConfig, Status, VarType
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.transcribe.nlp import NLP


def _abs_epigraph_vgp(nsteps=16, dt=0.5, window=None):
    """1-D single integrator, min sum |u| via an epigraph param column
    s >= u, s >= -u (the canonical MILP example's absConstraint trick,
    etol_glpk_example1.cpp:131-158, as a param instead of a fake
    control)."""
    vgp = VGP(nsteps=nsteps, dt=dt)
    vgp.x0 = [0.0]
    vgp.xf = [4.0]
    vgp.xtol = [0.05]
    vgp.xlower = [-10.0]
    vgp.xupper = [10.0]
    vgp.ulower = [-1.0]
    vgp.uupper = [1.0]
    t_hi = nsteps * dt
    win = window or (0.0, t_hi)
    vgp.add_params(
        {"s": ParamConfig(VarType.CONTINUOUS, 0.0, 10.0, *win)}
    )
    dims = vgp.dims()
    assert dims.n_params == 1
    assert dims.node_width == 3

    def dyn(x, u, t, data):
        return u

    def cost(x, u, t, data, p):
        return p[0]

    def epi(x, u, t, data, p):
        # |u| <= s, elementwise: both one-sided rows
        return jnp.stack([u[0] - p[0], -u[0] - p[0]])

    nlp = NLP(
        dims=dims,
        dynamics=dyn,
        running_cost=cost,
        path_ineq=(epi,),
        scheme="trapezoidal",
        cost_form="sum",
        use_obstacles=False,
    )
    return vgp, nlp


def test_param_columns_solve_epigraph():
    vgp, nlp = _abs_epigraph_vgp()
    data, dims = vgp.to_device()
    res = solve(nlp, SolverConfig(), data)
    assert int(res.status) == int(Status.SOLVED)
    Z = res.z.reshape(dims.nodes, dims.node_width)
    U, P = np.asarray(Z[:, 1]), np.asarray(Z[:, 2])
    # epigraph tight: s ~ |u| wherever u is active
    assert np.all(P >= np.abs(U) - 1e-3)
    X = np.asarray(Z[:, 0])
    assert abs(X[-1] - 4.0) <= 0.06
    # objective ~ minimal total |u| = distance / dt = 4/0.5 = 8 in sum
    # form (sum of s over nodes >= sum |u| >= distance/dt)
    assert float(res.obj) <= 8.6


def test_param_window_pins_outside():
    # window covers only the second half of the horizon: the param
    # column must be exactly 0 before t_start (eGLPK creates no variable
    # there; here the bounds pin it)
    vgp, nlp = _abs_epigraph_vgp(window=(4.0, 8.0))
    data, dims = vgp.to_device()
    lb, ub = nlp.bounds(data)
    LB = np.asarray(lb).reshape(dims.nodes, dims.node_width)
    UB = np.asarray(ub).reshape(dims.nodes, dims.node_width)
    ts = np.arange(dims.nodes) * 0.5
    inside = (ts >= 4.0) & (ts <= 8.0)
    np.testing.assert_array_equal(LB[~inside, 2], 0.0)
    np.testing.assert_array_equal(UB[~inside, 2], 0.0)
    np.testing.assert_array_equal(UB[inside, 2], 10.0)


def test_param_vartype_rides_integer_mask():
    from etol_tpu.solve.branch_bound import integer_mask

    vgp, nlp = _abs_epigraph_vgp()
    vgp.add_params(
        {"b": ParamConfig(VarType.BINARY, 0.0, 1.0, 0.0, 8.0)}
    )
    m = integer_mask(vgp)
    # [x, u, b, s] (params sorted by name)
    assert m.tolist() == [False, False, True, False]
