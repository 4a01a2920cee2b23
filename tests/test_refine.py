"""Mesh-refinement ladder tests (ePSOPT/eDymos auto-refinement parity
in bucketed-shape form)."""
import numpy as np
import pytest

from etol_tpu.core.types import Status
from etol_tpu.models import canonical_ocp_2d
from etol_tpu.solve import SolverConfig, solve
from etol_tpu.solve.refine import solve_refined


def _make(nsteps):
    # the canonical smooth VGP at an arbitrary mesh: keep the 16 s
    # horizon, so dt = 16 / nsteps
    vgp, nlp = canonical_ocp_2d()
    vgp.nsteps = nsteps
    vgp.dt = 16.0 / nsteps
    from etol_tpu.transcribe.nlp import NLP
    import dataclasses

    nlp = dataclasses.replace(nlp, dims=vgp.dims())
    return vgp, nlp


def test_ladder_converges():
    out = solve_refined(_make, SolverConfig(), nsteps0=16, levels=3)
    assert [n for n, _ in out] == [16, 32, 64]
    objs = [float(r.obj) for _, r in out]
    # every rung solves, and the fine rungs agree (mesh-converged)
    for _, r in out:
        assert int(r.status) == int(Status.SOLVED)
        assert float(r.viol_eq) < 1e-3
    assert abs(objs[2] - objs[1]) < 0.05
    # refined solution agrees with a cold solve at the fine mesh
    vgp, nlp = _make(64)
    data, _ = vgp.to_device()
    cold = solve(nlp, SolverConfig(), data)
    assert float(out[2][1].obj) == pytest.approx(
        float(cold.obj), abs=0.05
    )
