"""Named sampling planners (eOMPL parity: RRT/SST/EST/KPIECE/PDST).

The reference picks an OMPL planner by name (eOMPL.cpp:121-159) and
returns the best kinodynamic rollout; these tests check each name here
produces a dynamically consistent, collision-aware rollout that makes
real progress to the goal, plus the facade plumbing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu.core.problem import VGP
from etol_tpu.models import dynamics
from etol_tpu.solve import PLANNERS, planners
from etol_tpu.optimizer import TrajectoryOptimizer


def _problem():
    vgp = VGP(nsteps=16, dt=0.25)
    vgp.x0 = [0.0, 0.0]
    vgp.xf = [3.0, 2.5]
    vgp.xtol = [0.3, 0.3]
    vgp.xlower = [-5.0, -5.0]
    vgp.xupper = [5.0, 5.0]
    vgp.ulower = [-2.0, -2.0]
    vgp.uupper = [2.0, 2.0]
    vgp.add_exclusion_zone(
        [[1.2, 0.8], [1.8, 0.8], [1.8, 1.6], [1.2, 1.6]]
    )
    return vgp


_SIZES = {"PDST": 512, "SST": 256, "RRT": 256, "EST": 512, "KPIECE": 512}


@pytest.mark.parametrize("name", PLANNERS)
def test_each_planner_progresses_to_goal(name):
    vgp = _problem()
    data, dims = vgp.to_device()
    X, U, info = planners.plan(
        name,
        dynamics.single_integrator,
        dims.nsteps,
        data,
        n_samples=_SIZES[name],
        key=jax.random.PRNGKey(3),
    )
    assert X.shape == (dims.nodes, dims.nx)
    assert U.shape == (dims.nodes, dims.nu)
    assert np.all(np.isfinite(np.asarray(X)))
    # strictly closer to the goal than the start (weak but universal)
    d0 = float(jnp.linalg.norm(data.x0 - data.xf))
    dN = float(jnp.linalg.norm(X[-1] - data.xf))
    assert dN < 0.5 * d0, f"{name}: {dN} vs start {d0}"


@pytest.mark.parametrize("name", ["PDST", "SST"])
def test_batch_planners_reach_goal_collision_free(name):
    """The pure-batch planners have enough samples to actually reach
    the goal band around one box obstacle."""
    vgp = _problem()
    data, dims = vgp.to_device()
    X, U, info = planners.plan(
        name,
        dynamics.single_integrator,
        dims.nsteps,
        data,
        n_samples=1024,
        key=jax.random.PRNGKey(0),
    )
    from etol_tpu.transcribe import obstacles as obs_mod

    ts = jnp.arange(dims.nodes, dtype=X.dtype) * data.dt
    g = jax.vmap(
        lambda x, t: obs_mod.collision_values(
            x[:2], t, data.obstacles, data.tracks
        )
    )(X, ts)
    assert float(jnp.max(g)) <= 1e-5
    assert float(jnp.linalg.norm(X[-1] - data.xf)) < 0.6


def test_tree_planner_grows_tree():
    vgp = _problem()
    data, dims = vgp.to_device()
    X, U, info = planners.plan(
        "RRT",
        dynamics.single_integrator,
        dims.nsteps,
        data,
        n_samples=128,
        key=jax.random.PRNGKey(1),
        batch=16,
    )
    assert int(info["n_nodes"]) > 10  # the tree actually grew
    assert int(info["best_depth"]) > 0


def test_unknown_planner_raises():
    vgp = _problem()
    data, dims = vgp.to_device()
    with pytest.raises(ValueError):
        planners.plan(
            "PRM*", dynamics.single_integrator, dims.nsteps, data
        )


def test_optimizer_facade_set_planner_and_plan():
    """eOMPL-as-backend flow: set_planner -> setup -> plan -> getters."""
    opt = TrajectoryOptimizer()
    opt.vgp = _problem()
    opt.set_dynamics(dynamics.single_integrator)
    opt.set_objective(lambda x, u, t, d: u[0] ** 2 + u[1] ** 2)
    opt.set_planner("SST")
    opt.setup()
    res = opt.plan(n_samples=512, key=jax.random.PRNGKey(0))
    assert res.z.shape == (opt.dims.nz,)
    ts, Xt = opt.get_xtraj()
    assert Xt.shape == (opt.dims.nodes, 2)
    with pytest.raises(ValueError):
        opt.set_planner("nope")
