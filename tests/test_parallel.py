"""Sharding tests on the 8-fake-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8 — the standard pjit test trick,
SURVEY.md §4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from etol_tpu import batch_tile
from etol_tpu.models import canonical_ocp_2d, uas_2d
from etol_tpu.parallel import horizon as hz
from etol_tpu.parallel import make_mesh, shard_batch, solve_sharded
from etol_tpu.solve import SolverConfig, solve_batched


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.shape == {"batch": 8}


def test_batch_sharded_solve_matches_single_device():
    vgp, nlp = canonical_ocp_2d()
    data, dims = vgp.to_device()
    B = 8
    bdata = batch_tile(data, B)
    x0s = jnp.asarray(
        [[1.0 + 0.03 * i, 2.0] for i in range(B)], jnp.float32
    )
    bdata = dataclasses.replace(bdata, x0=x0s)
    cfg = SolverConfig(max_outer=6, max_inner=15)

    res_local = solve_batched(nlp, cfg, bdata)
    mesh = make_mesh()
    res_shard = solve_sharded(nlp, cfg, bdata, mesh)
    np.testing.assert_allclose(
        np.asarray(res_local.obj), np.asarray(res_shard.obj), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_local.z), np.asarray(res_shard.z), atol=1e-3
    )
    # result batch axis is actually sharded over the mesh
    assert len(res_shard.z.sharding.device_set) == 8


def test_horizon_sharded_defects_match_reference():
    # nodes = 8*k so the horizon axis divides K: nsteps=15 -> K=16
    vgp, nlp = uas_2d(nsteps=15, dt=0.4)
    data, dims = vgp.to_device()
    mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("batch", "horizon"))
    Z = nlp.initial_guess(data).reshape(dims.nodes, -1)
    Z = Z + 0.01 * jnp.sin(jnp.arange(Z.size, dtype=jnp.float32)).reshape(
        Z.shape
    )
    with mesh:
        f = hz.sharded_defects(nlp, data, mesh, "horizon")
        Zs = jax.device_put(Z, NamedSharding(mesh, P("horizon", None)))
        defs = np.asarray(f(Zs, data))
    ref = np.asarray(nlp.step_defects(Z.reshape(-1), data))
    np.testing.assert_allclose(defs[:-1], ref, atol=1e-5)
    np.testing.assert_allclose(defs[-1], 0.0, atol=1e-7)


def test_horizon_sharded_al_pieces():
    vgp, nlp = uas_2d(nsteps=15, dt=0.4)
    data, dims = vgp.to_device()
    mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("batch", "horizon"))
    Z = nlp.initial_guess(data).reshape(dims.nodes, -1)
    with mesh:
        f = hz.sharded_al_pieces(nlp, data, mesh, "horizon")
        Zs = jax.device_put(Z, NamedSharding(mesh, P("horizon", None)))
        cost, viol = f(Zs, data)
    ref_cost = float(nlp.objective(Z.reshape(-1), data))
    ref_viol = float(jnp.sum(nlp.step_defects(Z.reshape(-1), data) ** 2))
    assert float(cost) == pytest.approx(ref_cost, rel=1e-5)
    assert float(viol) == pytest.approx(ref_viol, rel=1e-5, abs=1e-7)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
