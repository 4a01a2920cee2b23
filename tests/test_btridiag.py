"""Block-tridiagonal Cholesky tests against dense oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from etol_tpu.solve import btridiag


def _random_spd_btd(rng, K, w, coupling=0.3):
    D = rng.normal(size=(K, w, w))
    D = D @ D.transpose(0, 2, 1) + 5.0 * np.eye(w)
    O = rng.normal(size=(max(K - 1, 0), w, w)) * coupling
    return D, O


@pytest.mark.parametrize("K,w", [(1, 3), (2, 4), (9, 6), (33, 4), (4, 12)])
def test_solve_matches_dense(K, w):
    rng = np.random.default_rng(K * 100 + w)
    D, O = _random_spd_btd(rng, K, w)
    r = rng.normal(size=(K, w))
    Dj, Oj, rj = map(jnp.asarray, (D, O, r))
    x = np.asarray(btridiag.solve(Dj, Oj, rj))
    H = np.asarray(btridiag.to_dense(Dj, Oj))
    x_ref = np.linalg.solve(H, r.reshape(-1)).reshape(K, w)
    np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-5)


def test_matvec_roundtrip():
    rng = np.random.default_rng(7)
    D, O = _random_spd_btd(rng, 12, 5)
    r = rng.normal(size=(12, 5))
    Dj, Oj, rj = map(jnp.asarray, (D, O, r))
    x = btridiag.solve(Dj, Oj, rj)
    back = np.asarray(btridiag.matvec(Dj, Oj, x))
    np.testing.assert_allclose(back, r, rtol=1e-3, atol=1e-3)


def test_vmapped_batch():
    rng = np.random.default_rng(3)
    B, K, w = 4, 6, 3
    Ds, Os, rs = [], [], []
    for _ in range(B):
        D, O = _random_spd_btd(rng, K, w)
        Ds.append(D)
        Os.append(O)
        rs.append(rng.normal(size=(K, w)))
    D, O, r = map(lambda a: jnp.asarray(np.stack(a)), (Ds, Os, rs))
    xs = jax.vmap(btridiag.solve)(D, O, r)
    for b in range(B):
        H = np.asarray(btridiag.to_dense(D[b], O[b]))
        x_ref = np.linalg.solve(H, np.asarray(r[b]).reshape(-1))
        np.testing.assert_allclose(
            np.asarray(xs[b]).reshape(-1), x_ref, rtol=2e-4, atol=2e-5
        )


def test_jit_and_grad_safe():
    # factor/solve must be jittable (static shapes only)
    rng = np.random.default_rng(1)
    D, O = _random_spd_btd(rng, 5, 4)
    r = rng.normal(size=(5, 4))
    f = jax.jit(btridiag.solve)
    x = f(jnp.asarray(D), jnp.asarray(O), jnp.asarray(r))
    assert bool(jnp.all(jnp.isfinite(x)))
