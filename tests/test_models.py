"""Model-family golden tests: the BASELINE.json scaling configurations."""
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu.core.types import Status
from etol_tpu.models import (
    fixed_wing_3dof,
    point_mass_3d,
    uas_2d,
)
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.transcribe import obstacles as ob


def test_uas_2d_solves():
    from etol_tpu.solve import solve_multistart

    vgp, nlp = uas_2d(nsteps=50)
    data, dims = vgp.to_device()
    # nonconvex 3-obstacle field: single-start AL is basin-sensitive
    # (and XLA-CPU reduction order varies with load) — the robust entry
    # point is multistart + a collision-free shooting seed
    res = solve_multistart(
        nlp, SolverConfig(), data, 8, shooting_samples=1024
    )
    assert int(res.status) == int(Status.SOLVED)
    X, U = nlp.unpack(res.z)
    np.testing.assert_allclose(
        np.asarray(X[-1, :2]), [8.0, 6.0], atol=0.06
    )
    # speed/turn bounds respected
    assert float(jnp.min(U[:, 0])) >= -1e-5
    assert float(jnp.max(U[:, 0])) <= 2.0 + 1e-5
    assert float(jnp.max(jnp.abs(U[:, 1]))) <= 1.5 + 1e-5


def test_point_mass_3d_spherical_tracks():
    vgp, nlp = point_mass_3d()
    data, dims = vgp.to_device()
    assert data.tracks.xy.shape[-1] == 3  # true 3-D tracks
    res = solve(nlp, SolverConfig(), data)
    assert int(res.status) == int(Status.SOLVED)
    X, _ = nlp.unpack(res.z)
    np.testing.assert_allclose(
        np.asarray(X[-1]), [6.0, 5.0, 2.0], atol=0.06
    )
    # no node penetrates a moving sphere (3-D distance)
    ts = np.arange(dims.nodes) * float(vgp.dt)
    worst = max(
        float(jnp.max(ob.track_values(X[k], jnp.asarray(ts[k]),
                                      data.tracks)))
        for k in range(dims.nodes)
    )
    assert worst <= 1e-3


def test_fixed_wing_reaches_goal_band():
    vgp, nlp = fixed_wing_3dof()
    data, dims = vgp.to_device()
    # the fixed-wing valley is long: converges steadily but needs budget
    res = solve(nlp, SolverConfig(max_outer=30, max_inner=60), data)
    X, U = nlp.unpack(res.z)
    # dynamics closed to parity-relevant accuracy and goal band reached
    assert float(res.viol_eq) < 1e-3
    np.testing.assert_allclose(
        np.asarray(X[-1, :3]),
        np.asarray(data.xf[:3]),
        atol=0.006,  # km: within the declared 5 m band + slack
    )
    assert float(jnp.min(U[:, 2])) >= -1e-4  # throttle in [0, 1]
    assert float(jnp.max(U[:, 2])) <= 1.0 + 1e-4


def test_tuned_config_registry():
    """The measured per-model configs (models/tuned.py) resolve for
    every canonical family, produce valid SolverConfigs/stages, and the
    tuned config actually solves its model (smoke, small batch)."""
    import dataclasses

    import pytest

    from etol_tpu import batch_tile
    from etol_tpu.models import (
        double_integrator_2d,
        tuned_config,
        warm_config,
    )
    from etol_tpu.solve import al_sqp

    for name in ("double_integrator_2d", "uas_2d", "point_mass_3d",
                 "fixed_wing_3dof"):
        cfg, raw = tuned_config(name, kkt_solver="scan")
        assert cfg.max_total > 0 and cfg.kkt_solver == "scan"
        assert all(dv >= 2 and bd > 0 for dv, bd in raw)
        _, stages = tuned_config(name, batch=1024, kkt_solver="scan")
        assert all(1 <= c <= 1024 for c, _ in stages)

    # warm phase: a small positive budget + B-resolved tail stages
    # (exact numbers live in the registry and move with measurement)
    wcfg, wstages = warm_config(cfg, batch=1024)
    assert 0 < wcfg.max_total <= cfg.max_total
    assert all(1 <= c <= 1024 and b > 0 for c, b in wstages)

    with pytest.raises(KeyError):
        tuned_config("no_such_model")

    vgp, nlp = double_integrator_2d()
    # the registry configs pair with the registry's model-level
    # transcription choices (obstacle_form etc.) — apply them like the
    # bench/ladder do
    from etol_tpu.models.tuned import tuned_extras

    ex = tuned_extras("double_integrator_2d")
    if "obstacle_form" in ex:
        nlp = dataclasses.replace(
            nlp, obstacle_form=ex["obstacle_form"]
        )
    data, dims = vgp.to_device()
    bdata = batch_tile(data, 8)
    cfg, raw = tuned_config("double_integrator_2d", kkt_solver="scan")
    # a B=8 compaction ladder resolves to 1-2-lane stage capacities
    # (shape artifact, not what the registry was swept for); the
    # registry's guarantee is the CUMULATIVE budget — phase +
    # stage budgets — which must converge the model outright
    cum = cfg.max_total + sum(b for _, b in raw)
    cfg = dataclasses.replace(cfg, max_total=cum)
    res = al_sqp.solve_batched(nlp, cfg, bdata)
    assert bool(jnp.all(res.status == 1)), res.status


def test_tuned_extras_registry():
    """Model-level transcription/seed choices resolve and are copies
    (mutating the returned dict must not corrupt the registry)."""
    from etol_tpu.models.tuned import tuned_extras

    ex = tuned_extras("uas_2d")
    assert ex.get("obstacle_form") in ("pieces", "both", "ellipses")
    ex["obstacle_form"] = "mutated"
    assert tuned_extras("uas_2d")["obstacle_form"] != "mutated"
    assert tuned_extras("no_such_model") == {}


def test_tuned_uas_quality_no_drift():
    """Throughput retunes must not quietly trade away solution quality:
    the registry uas config (pieces containment + seeds + its tight
    budgets) must land objectives within 2% of a fat-budget reference
    solve of the same transcription on a scattered mini-fleet. (r5
    context: the band->pieces switch and the rho0=3160 schedule were
    BOTH accepted partly on objective grounds — this pins that.)"""
    import dataclasses

    import jax

    from etol_tpu.bench_harness import make_batch
    from etol_tpu.models import uas_2d
    from etol_tpu.models.tuned import tuned_config, tuned_extras
    from etol_tpu.solve import al_sqp, shooting

    B = 16
    vgp, nlp = uas_2d(nsteps=50)
    ex = tuned_extras("uas_2d")
    nlp = dataclasses.replace(nlp, obstacle_form=ex["obstacle_form"])
    data, dims = vgp.to_device()
    bdata = make_batch(nlp, data, B, jax.random.PRNGKey(5))
    cfg, stages = tuned_config("uas_2d", batch=B, kkt_solver="scan")
    z0 = jax.vmap(
        lambda d: shooting.plan_guess(
            nlp, d, ex["seed_walks"], pulled=ex["seed_pulled"]
        )
    )(bdata)
    # cumulative budget (ladder shapes are meaningless at B=16)
    cum = cfg.max_total + sum(b for _, b in stages)
    res = al_sqp.solve_batched(
        nlp, dataclasses.replace(cfg, max_total=cum), bdata, z0
    )
    assert bool(jnp.all(res.status == 1)), res.status
    # fat-budget reference: generous iterations, same transcription
    ref_cfg = dataclasses.replace(
        cfg, max_total=600, rho0=1000.0, rho_growth=2.0
    )
    ref = al_sqp.solve_batched(nlp, ref_cfg, bdata, z0)
    ok = ref.status == 1
    import numpy as np

    r = np.asarray(res.obj)[np.asarray(ok)]
    f = np.asarray(ref.obj)[np.asarray(ok)]
    assert ok.sum() >= B - 1
    # mean within 2%; no instance more than 10% worse (basin wobble)
    assert float(np.mean(r) / np.mean(f)) <= 1.02, (r.mean(), f.mean())
    assert float(np.max(r / f)) <= 1.10, np.max(r / f)


def test_tuned_fw_quality_no_drift():
    """Same guard for the fixed-wing chord composite: its ~1.2%
    objective delta vs the pure-Newton path is measured and documented
    (docs/perf.md r5) — pin it at <= 3% mean so a future chord/schedule
    sweep cannot quietly grow it."""
    import dataclasses

    import jax

    from etol_tpu import batch_tile
    from etol_tpu.models import fixed_wing_3dof
    from etol_tpu.models.tuned import tuned_config, tuned_extras
    from etol_tpu.solve import al_sqp

    B = 8
    vgp, nlp = fixed_wing_3dof()
    ex = tuned_extras("fixed_wing_3dof")
    nlp = dataclasses.replace(nlp, scheme=ex["scheme"])
    data, dims = vgp.to_device()
    bdata = batch_tile(data, B)
    key = jax.random.PRNGKey(2)
    d = jax.random.uniform(key, (B, dims.nx), minval=-0.05,
                           maxval=0.05).astype(jnp.float32)
    mask = jnp.zeros((dims.nx,)).at[jnp.asarray([0, 1])].set(1.0)
    bdata = dataclasses.replace(bdata, x0=bdata.x0 + d * mask)
    cfg, stages = tuned_config("fixed_wing_3dof", batch=B,
                               kkt_solver="scan")
    cum = cfg.max_total + sum(b for _, b in stages)
    res = al_sqp.solve_batched(
        nlp, dataclasses.replace(cfg, max_total=cum), bdata
    )
    assert bool(jnp.all(res.status == 1)), res.status
    ref = al_sqp.solve_batched(
        nlp,
        dataclasses.replace(cfg, chord_steps=0, max_total=400),
        bdata,
    )
    ok = np.asarray(ref.status) == 1
    r = np.asarray(res.obj)[ok]
    f = np.asarray(ref.obj)[ok]
    assert ok.sum() >= B - 1
    assert float(np.mean(r) / np.mean(f)) <= 1.03, (r.mean(), f.mean())
