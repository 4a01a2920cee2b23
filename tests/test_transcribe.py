"""Collocation + obstacle-evaluation + NLP assembly tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu import NLP, load_configs
from etol_tpu.transcribe import collocation, obstacles


def single_integrator(x, u, t, data):
    return u[: x.shape[0]]


def test_defect_zero_for_exact_trajectory():
    # x(t) = t for both states under u = 1 -> trapezoid/euler defects vanish
    K = 9
    dt = 0.25
    ts = np.arange(K) * dt
    X = jnp.asarray(np.stack([ts, ts], axis=-1))
    U = jnp.ones((K, 2))
    for scheme in ("euler", "trapezoidal", "hermite_simpson"):
        d = collocation.defects(single_integrator, X, U, dt, None, scheme)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_defect_nonzero_when_infeasible():
    K = 5
    X = jnp.zeros((K, 2))
    U = jnp.ones((K, 2))
    d = collocation.defects(single_integrator, X, U, 0.5, None, "trapezoidal")
    assert float(jnp.abs(d).max()) > 0.1


def test_integral_cost_trapezoid():
    # integral of u^2 with u(t)=t over [0,1]: exact 1/3, trapezoid approx
    K = 101
    dt = 0.01
    ts = np.arange(K) * dt
    U = jnp.asarray(ts)[:, None]
    X = jnp.zeros((K, 1))
    J = collocation.integral_cost(
        lambda x, u, t, d: u[0] ** 2, X, U, dt, None, "trapezoidal"
    )
    assert float(J) == pytest.approx(1.0 / 3.0, abs=1e-3)


def test_obstacle_values_signs(mip_xml):
    v = load_configs(mip_xml)
    data, dims = v.to_device()
    # centroid of obstacle 0 is inside some edge-ellipse -> positive value
    c = np.mean(v.obstacles[0], axis=0)
    g_in = obstacles.collision_values(
        jnp.asarray(c), jnp.asarray(0.0), data.obstacles, data.tracks
    )
    assert float(jnp.max(g_in[:9])) > 0
    # a far-away point is feasible everywhere
    g_out = obstacles.collision_values(
        jnp.asarray([6.5, 0.5]), jnp.asarray(0.0), data.obstacles, data.tracks
    )
    assert float(jnp.max(g_out)) < 0


def test_track_values_move_with_time(ocp_xml):
    v = load_configs(ocp_xml)
    data, _ = v.to_device()
    # track 0 moves from (1.51,2) at t=0 to (2,2) at t=32
    p = jnp.asarray([1.51, 2.0])
    g0 = obstacles.track_values(p, jnp.asarray(0.0), data.tracks)
    g16 = obstacles.track_values(p, jnp.asarray(32.0), data.tracks)
    assert float(g0[0]) > 0  # at the center at t=0 -> violating
    assert float(g0[0]) > float(g16[0])  # farther away later


def test_halfspace_margin_matches_point_in_polygon(mip_xml):
    from etol_tpu.core import geometry
    v = load_configs(mip_xml)
    data, _ = v.to_device()
    rng = np.random.default_rng(0)
    pts = rng.uniform(1.5, 4.5, size=(64, 2))
    for p in pts:
        inside_ref = any(
            geometry.point_in_polygon(p, poly) for poly in v.obstacles
        )
        inside_dev = bool(
            obstacles.inside_any_piece(jnp.asarray(p), data.obstacles)
        )
        # strict interior must agree; boundary may differ by eps
        on_boundary = any(
            geometry.point_in_polygon(p + 1e-7, poly)
            != geometry.point_in_polygon(p - 1e-7, poly)
            for poly in v.obstacles
        )
        if not on_boundary:
            assert inside_dev == inside_ref


def _nlp(v, **kw):
    data, dims = v.to_device()
    nlp = NLP(
        dims=dims,
        dynamics=single_integrator,
        running_cost=lambda x, u, t, d: jnp.sum(u * u),
        **kw,
    )
    return nlp, data


def test_nlp_shapes_and_bounds(ocp_xml):
    v = load_configs(ocp_xml)
    nlp, data = _nlp(v)
    z = nlp.initial_guess(data)
    assert z.shape == (nlp.nz,)
    ceq = nlp.eq_residuals(z, data)
    assert ceq.shape == (v.nsteps * v.nx,)
    # per node: 9 edge ellipses + 3 convex pieces (5-corner splits in 2,
    # 4-corner is 1) + 2 tracks
    g = nlp.ineq_residuals(z, data)
    assert g.shape == ((v.nsteps + 1) * (9 + 3 + 2),)
    lb, ub = nlp.bounds(data)
    assert lb.shape == ub.shape == (nlp.nz,)
    assert bool(jnp.all(lb <= ub))
    # terminal band
    X, U = nlp.unpack(lb)
    np.testing.assert_allclose(np.asarray(X[-1]), [4.99, 3.99], atol=1e-6)
    # rhorizon=0 still pins at least node 0 to x0
    np.testing.assert_allclose(np.asarray(X[0]), [1.0, 2.0], atol=1e-6)


def test_nlp_gradients_finite(ocp_xml):
    v = load_configs(ocp_xml)
    nlp, data = _nlp(v)
    z = nlp.initial_guess(data)
    gobj = jax.grad(nlp.objective)(z, data)
    assert bool(jnp.all(jnp.isfinite(gobj)))
    Jeq = jax.jacfwd(nlp.eq_residuals)(z, data)
    assert bool(jnp.all(jnp.isfinite(Jeq)))


def test_nlp_vmaps(ocp_xml):
    from etol_tpu import batch_tile
    v = load_configs(ocp_xml)
    nlp, data = _nlp(v)
    B = 4
    bdata = batch_tile(data, B)
    z = jax.vmap(nlp.initial_guess)(bdata)
    assert z.shape == (B, nlp.nz)
    J = jax.vmap(nlp.objective)(z, bdata)
    assert J.shape == (B,)
