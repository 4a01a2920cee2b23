"""Cross-validation parity tests, modeled on the reference's own
quality strategy (SURVEY.md §4: cross-backend comparison on the same
XML was its only oracle; example2 hard-codes what example1 loads)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu import VGP, load_configs
from etol_tpu.models import canonical_ocp_2d, dynamics
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.transcribe.nlp import NLP


def _hardcoded_ocp() -> VGP:
    """The canonical smooth VGP built programmatically — the
    etol_gurobi_example2 pattern (hard-coded twin of the XML problem,
    etol_gurobi_example2.cpp:54-131)."""
    v = VGP(nsteps=32, dt=0.5)
    v.x0 = [1.0, 2.0]
    v.xf = [5.0, 4.0]
    v.xtol = [0.01, 0.01]
    v.xlower = [0.0, 0.0]
    v.xupper = [7.0, 7.0]
    v.ulower = [-0.5, -0.5]
    v.uupper = [0.5, 0.5]
    v.add_exclusion_zone(
        [[3.2, 2.5], [3.4, 2.6], [3.5, 3.4], [3.3, 3.0], [3.1, 3.5]]
    )
    v.add_exclusion_zone(
        [[2.2, 2.5], [2.4, 2.6], [2.5, 3.4], [2.1, 3.5]]
    )
    v.add_track(0.5, [0.0, 32.0], [[1.51, 2.0], [2.0, 2.0]])
    v.add_track(0.5, [0.0, 32.0], [[1.0, 4.0], [1.0, 3.0]])
    return v


def test_hardcoded_equals_xml(ocp_xml):
    """Same problem defined both ways -> identical device arrays and
    identical solve results."""
    vx = load_configs(ocp_xml)
    vh = _hardcoded_ocp()
    dx, dimx = vx.to_device()
    dh, dimh = vh.to_device()
    assert dimx == dimh
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(dx), jax.tree_util.tree_leaves(dh)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    nlp = NLP(
        dims=dimx,
        dynamics=dynamics.single_integrator,
        running_cost=lambda x, u, t, d: u[0] ** 2 + u[1] ** 2,
    )
    rx = solve(nlp, SolverConfig(), dx)
    rh = solve(nlp, SolverConfig(), dh)
    assert float(rx.obj) == float(rh.obj)  # bitwise-identical inputs


def test_scheme_consistency(ocp_xml):
    """Trapezoidal and Hermite-Simpson discretizations of the same
    smooth OCP agree at N=32 (both converged transcriptions of the same
    continuous problem)."""
    objs = {}
    for scheme in ("trapezoidal", "hermite_simpson"):
        vgp, nlp = canonical_ocp_2d(ocp_xml, scheme=scheme)
        data, _ = vgp.to_device()
        res = solve(nlp, SolverConfig(), data)
        assert float(res.viol_eq) < 1e-3, scheme
        objs[scheme] = float(res.obj)
    assert objs["trapezoidal"] == pytest.approx(
        objs["hermite_simpson"], abs=0.05
    )


def test_mpc_x0_swap_no_retrace(ocp_xml):
    """changeX0 parity (eGurobi.cpp:419-432): swapping x0 arrays must hit
    the jit cache — an MPC re-solve may not retrace.

    Counted via the jitted wrapper's compilation-cache size; the test
    FAILS (not skips) if that introspection ever disappears, so the
    fast-path guarantee cannot silently become untested."""
    vgp, nlp = canonical_ocp_2d(ocp_xml)
    data, _ = vgp.to_device()
    cfg = SolverConfig(max_outer=2, max_inner=4)
    r1 = solve(nlp, cfg, data)
    size = getattr(solve, "_cache_size", None)
    assert callable(size), (
        "jax no longer exposes _cache_size on jitted callables; "
        "re-implement this check (e.g. via jax.monitoring compile events)"
    )
    n0 = size()
    d2 = dataclasses.replace(data, x0=data.x0 + jnp.float32(0.01))
    r2 = solve(nlp, cfg, d2)
    assert r2.z.shape == r1.z.shape
    d3 = dataclasses.replace(data, x0=data.x0 + jnp.float32(0.02))
    solve(nlp, cfg, d3)
    assert size() == n0, "x0 swap retraced the MPC fast path"
