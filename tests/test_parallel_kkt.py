"""Horizon-sharded distributed KKT solve vs the single-device factor.

The SPIKE/Schur partitioned elimination (parallel/kkt.py) must
reproduce the sequential block-Cholesky solution on the same system —
on a fake-device CPU mesh (SURVEY.md §4's standard JAX trick).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from etol_tpu.parallel import kkt
from etol_tpu.solve import btridiag


def _random_system(K, w, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(K, w, w)).astype(np.float32)
    D = D @ D.transpose(0, 2, 1) + (3.0 + w) * np.eye(w, dtype=np.float32)
    O = (rng.normal(size=(K - 1, w, w)) * 0.3).astype(np.float32)
    r = rng.normal(size=(K, w)).astype(np.float32)
    return jnp.asarray(D, dtype), jnp.asarray(O, dtype), jnp.asarray(r, dtype)


@pytest.mark.parametrize("K,w,n", [(16, 3, 4), (64, 5, 8), (24, 2, 2)])
def test_sharded_solve_matches_sequential(K, w, n):
    D, O, r = _random_system(K, w, seed=K + w)
    mesh = Mesh(np.array(jax.devices()[:n]), ("horizon",))
    solver = kkt.make_solver(mesh, "horizon")
    with mesh:
        x = jax.jit(solver)(D, O, r)
    x_ref = btridiag.solve(D, O, r)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-4
    )


def test_sharded_solve_long_horizon():
    # K = 512 nodes over 8 shards — the long-horizon regime the axis
    # exists for (VERDICT round-1 item 3)
    K, w, n = 512, 5, 8
    D, O, r = _random_system(K, w, seed=7)
    mesh = Mesh(np.array(jax.devices()[:n]), ("horizon",))
    solver = kkt.make_solver(mesh, "horizon")
    with mesh:
        x = jax.jit(solver)(D, O, r)
    # residual check is more robust than elementwise x-comparison at f32
    res = r - btridiag.matvec(D, O, x)
    assert float(jnp.max(jnp.abs(res))) < 1e-3
    x_ref = btridiag.solve(D, O, r)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=5e-4, atol=5e-4
    )


def test_horizon_sharded_solve_matches_single_device():
    """Full AL-SQP with the node axis sharded over 8 fake devices must
    reproduce the single-device solve — on an OBSTACLE-AND-TRACK
    workload (VERDICT r3 weak #2: the canonical problems are
    obstacle-dense; inequality multipliers, the active-set mask and the
    GN corner blocks must all ride the SPIKE path)."""
    from etol_tpu.core.problem import VGP
    from etol_tpu.models import dynamics as dyn
    from etol_tpu.parallel.solve_sharded import solve_horizon_sharded
    from etol_tpu.solve import SolverConfig, solve
    from etol_tpu.transcribe.nlp import NLP

    nsteps = 63  # 64 nodes = 8 shards x 8
    vgp = VGP(nsteps=nsteps, dt=0.1)
    vgp.x0 = [0.0, 0.0]
    vgp.xf = [2.0, 0.0]
    vgp.xtol = [0.02, 0.05]
    vgp.xlower = [-5.0, -5.0]
    vgp.xupper = [5.0, 5.0]
    vgp.ulower = [-4.0, -4.0]
    vgp.uupper = [4.0, 4.0]
    # static zone blocking the straight line (below-line bias: unique
    # route basin) + a moving track crossing later in the corridor
    vgp.add_exclusion_zone(
        [[0.8, -0.25], [1.2, -0.25], [1.2, 0.1], [0.8, 0.1]]
    )
    vgp.add_track(
        0.15, [0.0, nsteps * 0.1], [[1.6, 0.8], [1.6, -0.8]]
    )
    dims = vgp.dims()
    nlp = NLP(
        dims=dims,
        dynamics=dyn.single_integrator,
        running_cost=lambda x, u, t, data: u[0] ** 2 + u[1] ** 2,
        scheme="trapezoidal",
    )
    data, _ = vgp.to_device()
    cfg = SolverConfig(max_total=600)

    res_ref = solve(nlp, cfg, data)
    mesh = Mesh(np.array(jax.devices()[:8]), ("horizon",))
    res_sh = solve_horizon_sharded(nlp, cfg, data, mesh)

    assert int(res_ref.status) == 1, (
        float(res_ref.viol_eq), float(res_ref.viol_in))
    assert int(res_sh.status) == 1, (
        float(res_sh.viol_eq), float(res_sh.viol_in))
    assert float(res_sh.viol_eq) < 1e-4
    assert float(res_sh.viol_in) < 1e-4
    # same basin and optimum up to the solver's own stationarity
    # tolerance (tol_stat 5e-4 leaves ~0.3% objective slack; partial
    # iterates near active inequalities are chaotic under reduction-
    # order changes, so converged optima are what's comparable)
    np.testing.assert_allclose(
        float(res_sh.obj), float(res_ref.obj), rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.z), np.asarray(res_ref.z), atol=5e-2
    )
    # the route actually threads the constraint field: outside the zone
    # (smooth containment is conservative, allow its tolerance band)
    X = np.asarray(res_sh.z).reshape(dims.nodes, -1)[:, :2]
    inside = (
        (X[:, 0] > 0.8 + 1e-3) & (X[:, 0] < 1.2 - 1e-3)
        & (X[:, 1] > -0.25 + 1e-3) & (X[:, 1] < 0.1 - 1e-3)
    )
    assert not inside.any()
