"""Facade tests: the TrajectoryOptimizer lifecycle (setup/solve/debug/
close parity, TrajectoryOptimizer.hpp:39-54) and the MPC fast path."""
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu import TrajectoryOptimizer
from etol_tpu.core.types import Status
from etol_tpu.models import dynamics


@pytest.fixture(scope="module")
def solved_opt(ocp_xml):
    topt = TrajectoryOptimizer()
    topt.load_configs(ocp_xml)
    topt.set_dynamics(dynamics.single_integrator)
    topt.set_objective(lambda x, u, t, d: u[0] ** 2 + u[1] ** 2)
    topt.setup()
    topt.solve()
    return topt


def test_lifecycle(solved_opt):
    topt = solved_opt
    assert topt.get_status() == Status.SOLVED
    assert 1.2 < topt.get_score() < 1.8
    times, X = topt.get_xtraj()
    _, U = topt.get_utraj()
    assert X.shape == (33, 2) and U.shape == (33, 2)
    assert float(times[-1]) == pytest.approx(16.0)
    np.testing.assert_allclose(np.asarray(X[-1]), [5.0, 4.0], atol=0.011)
    out = topt.debug()
    assert "status=SOLVED" in out
    assert "nodes=33" in out


def test_save_csv(solved_opt, tmp_path):
    p = solved_opt.save(solved_opt.get_xtraj(), str(tmp_path / "x.csv"))
    rows = open(p).read().strip().splitlines()
    assert rows[0].startswith("time,")
    assert len(rows) == 34


def test_mpc_step(solved_opt):
    topt = solved_opt
    # advance along the solved trajectory: warm re-solve must stay solved
    _, X = topt.get_xtraj()
    cold_iters = int(topt.result.inner_iters)
    res = topt.mpc_step(np.asarray(X[1]))
    assert int(res.status) == int(Status.SOLVED)
    # re-solve must be warm: clearly fewer inner iterations than cold
    assert int(res.inner_iters) < max(cold_iters, 30)
    # the first warm call traces (z0/lam0 pytree differs from cold);
    # subsequent mpc steps must hit the jit cache — no retrace
    _, X = topt.get_xtraj()
    topt.mpc_step(np.asarray(X[1]))
    assert topt.last_solve_seconds < 5.0


def test_setup_requires_callbacks(ocp_xml):
    topt = TrajectoryOptimizer()
    topt.load_configs(ocp_xml)
    with pytest.raises(ValueError):
        topt.setup()


def test_close(solved_opt):
    # close() drops results but the optimizer can be reused after solve()
    solved = solved_opt
    solved.close()
    assert solved.result is None
    solved.set_x0([1.0, 2.0])  # restore the canonical start (mpc moved it)
    solved.solve()
    assert solved.get_status() == Status.SOLVED


def test_solve_batch(solved_opt):
    """Facade-level fleet solve: tiled x0 variants in one device call,
    per-lane status (the docstring's "solve() accepts a batch" claim)."""
    topt = solved_opt
    x0 = np.asarray(topt.data.x0)[None, :] + np.array(
        # stay clear of track mexz0 (center (1.51, 2), r=0.5 at t=0):
        # +x perturbations from x0=(1,2) start inside the moving obstacle
        [[0.0, 0.0], [-0.05, -0.05], [-0.1, 0.1]], dtype=np.float32
    )
    res = topt.solve_batch(x0=jnp.asarray(x0))
    assert res.z.shape[0] == 3
    assert np.all(np.asarray(res.status) == int(Status.SOLVED))
    # solve_batch stores its result separately: the scalar lifecycle
    # (get_score/get_xtraj/mpc_step) keeps working on self.result
    assert topt.batch_result is res
    assert topt.result is not res
    float(topt.get_score())  # scalar accessor unaffected by the batch
    # warm fleet re-solve reuses the previous batched solution and must
    # show a real warm-start benefit, not just tie the budget
    res2 = topt.solve_batch(x0=jnp.asarray(x0 + 0.01), warm=True)
    assert np.all(np.asarray(res2.status) == int(Status.SOLVED))
    warm_mean = float(jnp.mean(res2.inner_iters))
    cold_mean = float(jnp.mean(res.inner_iters))
    assert warm_mean < max(0.8 * cold_mean, 30.0)
    # batch-size mismatch on warm falls back to cold with a warning
    with pytest.warns(UserWarning, match="falling back to cold"):
        res3 = topt.solve_batch(
            x0=jnp.asarray(x0[:2]), warm=True, rescue=False
        )
    assert res3.z.shape[0] == 2


def test_facade_solve_exact():
    """MILP-backend parity on the facade: `solve_exact()` runs the
    unified certified branch-and-bound, stores the MIPResult, and the
    scalar lifecycle (get_score/get_xtraj/save) keeps working on the
    incumbent trajectory."""
    from etol_tpu.models import composed_exact_demo
    from etol_tpu.optimizer import TrajectoryOptimizer

    vgp, nlp = composed_exact_demo()
    topt = TrajectoryOptimizer()
    topt.vgp = vgp
    topt.nlp = nlp
    topt.data, topt.dims = vgp.to_device()
    mres = topt.solve_exact(
        wave=8, max_nodes=384, convex_relaxation=True
    )
    assert mres.certified and mres.status == 1
    assert topt.mip_result is mres
    assert int(topt.result.status) == 1
    assert float(topt.get_score()) == pytest.approx(mres.obj, abs=1e-6)
    ts, X = topt.get_xtraj()
    assert X.shape == (topt.dims.nodes, 2)
    # endpoint reached within the declared band
    assert float(jnp.max(jnp.abs(X[-1] - topt.data.xf))) <= 0.021
