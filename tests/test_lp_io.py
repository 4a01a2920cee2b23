"""LP file read / solve / write_sol round trip — eGLPK parity
(read_lp/solve_lp/write_sol, eGLPK.cpp:253-272)."""
import numpy as np
import pytest

from etol_tpu.io.lp_io import LPModel, read_lp, solve_lp, write_sol


def test_read_lp_roundtrip_of_dump(ocp_xml, tmp_path):
    """write_lp's output parses back to consistent matrices."""
    from etol_tpu.io.lp_export import write_lp
    from etol_tpu.models import canonical_ocp_2d

    vgp, nlp = canonical_ocp_2d(ocp_xml)
    data, dims = vgp.to_device()
    text = write_lp(nlp, data)
    model = read_lp(text)
    K, w = dims.nodes, dims.nx + dims.nu
    assert model.n == K * w
    # every defect row present: nsteps * nx equality rows
    n_eq = sum(
        1 for lo, hi in zip(model.lhs, model.rhs)
        if np.isfinite(lo) and lo == hi
    )
    assert n_eq == dims.nsteps * dims.nx
    assert model.names[0] == "x_0_0"
    # x0 clamp shows up as fixed bounds on the first node's states
    j = model.names.index("x_0_1")
    assert model.lb[j] == model.ub[j] == pytest.approx(2.0)


def _toy_lp():
    # min -x - 2y  s.t.  x + y <= 4, x <= 3, y <= 2, x,y >= 0
    # optimum at (2, 2) -> obj = -6
    return LPModel(
        names=["x", "y"],
        c=np.array([-1.0, -2.0]),
        c0=0.0,
        A=np.array([[1.0, 1.0]]),
        lhs=np.array([-np.inf]),
        rhs=np.array([4.0]),
        lb=np.zeros(2),
        ub=np.array([3.0, 2.0]),
        row_names=["cap"],
    )


def test_solve_lp_toy():
    sol = solve_lp(_toy_lp())
    assert sol.status == "optimal"
    np.testing.assert_allclose(sol.x, [2.0, 2.0], atol=1e-4)
    assert sol.obj == pytest.approx(-6.0, abs=1e-3)


def test_solve_lp_matches_scipy():
    rng = np.random.default_rng(3)
    n, m = 8, 5
    A = rng.normal(size=(m, n))
    b = rng.uniform(1.0, 2.0, size=m)
    c = rng.normal(size=n)
    model = LPModel(
        names=[f"v{i}" for i in range(n)],
        c=c, c0=0.0, A=A,
        lhs=np.full(m, -np.inf), rhs=b,
        lb=np.zeros(n), ub=np.full(n, 1.0),
        row_names=[f"r{i}" for i in range(m)],
    )
    sol = solve_lp(model)
    from scipy.optimize import linprog

    ref = linprog(c, A_ub=A, b_ub=b, bounds=[(0, 1)] * n, method="highs")
    assert ref.success
    assert sol.obj == pytest.approx(ref.fun, abs=1e-3)


def test_lp_text_parse_and_sol_file(tmp_path):
    text = """\\ demo
Minimize
 obj: - x - 2 y
Subject To
 cap: x + y <= 4
Bounds
 0 <= x <= 3
 0 <= y <= 2
End
"""
    p = tmp_path / "toy.lp"
    p.write_text(text)
    model = read_lp(str(p))
    sol = solve_lp(model)
    out = write_sol(model, sol, str(tmp_path / "toy.sol"))
    body = open(out).read()
    assert "objective" in body and "x " in body
    assert sol.obj == pytest.approx(-6.0, abs=1e-3)
