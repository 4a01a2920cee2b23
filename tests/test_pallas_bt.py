"""Pallas lane-major block-tridiagonal kernel vs the XLA scan path
(interpret mode on CPU; the real-TPU comparison lives in
tools/profile_tpu.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etol_tpu.ops import pallas_bt
from etol_tpu.solve import btridiag


def _problem(B, K, w, seed=0):
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(B, K, w, w)).astype(np.float32)
    D = D @ D.transpose(0, 1, 3, 2) + 5 * np.eye(w, dtype=np.float32)
    O = (rng.normal(size=(B, K - 1, w, w)) * 0.3).astype(np.float32)
    r = rng.normal(size=(B, K, w)).astype(np.float32)
    return jnp.asarray(D), jnp.asarray(O), jnp.asarray(r)


@pytest.mark.parametrize("K,w", [(4, 3), (9, 4), (17, 5), (13, 9)])
def test_matches_scan(K, w):
    D, O, r = _problem(128, K, w, seed=K + w)
    x = pallas_bt.solve_lanes(D, O, r, True)
    x_ref = jax.vmap(btridiag.solve)(D, O, r)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-4
    )


def test_multi_tile_batch():
    D, O, r = _problem(256, 5, 3)
    x = pallas_bt.solve_lanes(D, O, r, True)
    back = jax.vmap(btridiag.matvec)(D, O, x)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(r), atol=2e-3
    )


def test_usable_guard():
    assert pallas_bt.usable(51, 5)
    assert pallas_bt.usable(101, 9)       # the fixed-wing N=100 shape
    assert not pallas_bt.usable(51, 12)   # w too wide for unrolling
    assert not pallas_bt.usable(5000, 8)  # VMEM cap
