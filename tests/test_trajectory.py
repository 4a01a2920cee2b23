"""Trajectory helper tests (template parity,
TrajectoryOptimizer.hpp:239-324; CSV save, TrajectoryOptimizer.cpp:626-674).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from etol_tpu.core import trajectory as tr


def test_linear_interpolation_inside():
    tvec = jnp.array([0.0, 1.0, 2.0])
    ref = jnp.array([0.0, 10.0, 0.0])
    assert float(tr.linear_interpolation(0.5, tvec, ref)) == pytest.approx(5.0)
    assert float(tr.linear_interpolation(1.5, tvec, ref)) == pytest.approx(5.0)


def test_linear_interpolation_extrapolates():
    # parity: outside the table, first/last segment extrapolated
    tvec = jnp.array([0.0, 1.0])
    ref = jnp.array([0.0, 2.0])
    assert float(tr.linear_interpolation(2.0, tvec, ref)) == pytest.approx(4.0)
    assert float(tr.linear_interpolation(-1.0, tvec, ref)) == pytest.approx(-2.0)


def test_linear_interpolation_vector_valued():
    tvec = jnp.array([0.0, 1.0])
    ref = jnp.array([[0.0, 0.0], [2.0, 4.0]])
    out = tr.linear_interpolation(0.5, tvec, ref)
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0])


def test_extract_scale_offset():
    times = jnp.array([0.0, 1.0])
    vals = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    t2, v2 = tr.extract((times, vals), [0, 2])
    np.testing.assert_allclose(np.asarray(v2), [[0.0, 2.0], [1.0, 4.0]])
    _, v3 = tr.scale((times, vals), [2.0])
    np.testing.assert_allclose(np.asarray(v3), [[2.0, 2.0], [6.0, 4.0]])
    _, v4 = tr.offset((times, vals), [0.0, -1.0])
    np.testing.assert_allclose(np.asarray(v4), [[1.0, 1.0], [3.0, 3.0]])


def test_csv_save_load_and_increment(tmp_path):
    times = jnp.array([0.0, 0.5, 1.0])
    vals = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    fp = str(tmp_path / "state.csv")
    out1 = tr.save((times, vals), fp)
    assert out1 == fp
    t2, v2 = tr.load_csv(out1)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(times), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vals), atol=1e-6)
    # second save must not overwrite: auto-increment the stem
    out2 = tr.save((times, vals), fp)
    assert out2 != fp and out2.endswith("state1.csv")
