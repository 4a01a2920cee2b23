"""Cyclic-reduction KKT solver vs dense/scan oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu.ops import cyclic_reduction as cr
from etol_tpu.solve import btridiag


def _spd(rng, K, w, coupling=0.3):
    D = rng.normal(size=(K, w, w))
    D = D @ D.transpose(0, 2, 1) + 5.0 * np.eye(w)
    O = rng.normal(size=(max(K - 1, 0), w, w)) * coupling
    return D, O


@pytest.mark.parametrize("K,w", [(1, 3), (4, 4), (7, 5), (33, 4), (51, 5)])
def test_matches_dense(K, w):
    rng = np.random.default_rng(K * 7 + w)
    D, O = _spd(rng, K, w)
    r = rng.normal(size=(K, w))
    Dj, Oj, rj = map(jnp.asarray, (D, O, r))
    x = np.asarray(cr.solve(Dj, Oj, rj))
    H = np.asarray(btridiag.to_dense(Dj, Oj))
    x_ref = np.linalg.solve(H, r.reshape(-1)).reshape(K, w)
    np.testing.assert_allclose(x, x_ref, rtol=3e-4, atol=3e-5)


def test_vmapped_and_jitted():
    rng = np.random.default_rng(0)
    B, K, w = 3, 9, 4
    Ds, Os, rs = [], [], []
    for _ in range(B):
        D, O = _spd(rng, K, w)
        Ds.append(D)
        Os.append(O)
        rs.append(rng.normal(size=(K, w)))
    D, O, r = map(lambda a: jnp.asarray(np.stack(a)), (Ds, Os, rs))
    xs = jax.jit(jax.vmap(cr.solve))(D, O, r)
    for b in range(B):
        back = np.asarray(btridiag.matvec(D[b], O[b], xs[b]))
        np.testing.assert_allclose(back, np.asarray(r[b]), atol=2e-3)


def test_solver_with_cr_kkt(ocp_xml):
    from etol_tpu.core.types import Status
    from etol_tpu.models import canonical_ocp_2d
    from etol_tpu.solve import SolverConfig, solve

    vgp, nlp = canonical_ocp_2d(ocp_xml)
    data, _ = vgp.to_device()
    res = solve(nlp, SolverConfig(kkt_solver="cr"), data)
    assert int(res.status) == int(Status.SOLVED)
    assert 1.25 <= float(res.obj) <= 1.8
