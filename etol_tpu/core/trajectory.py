"""Trajectory utilities.

The reference's ``traj_t`` (ETOL_Types.hpp:90-95) is a
``vector<pair<double, vector<double>>>``; on TPU a trajectory is simply a
pair of arrays ``times [K]`` and ``values [K, d]`` (batched: ``[B, K, d]``).
This module carries the reference's header-only template helpers
(TrajectoryOptimizer.hpp:239-324) as vectorised JAX functions plus the CSV
export with the no-overwrite auto-increment filename behavior
(TrajectoryOptimizer.cpp:626-674).
"""
from __future__ import annotations

import os
import re
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Traj = Tuple[jnp.ndarray, jnp.ndarray]  # (times [K], values [K, d])


def linear_interpolation(tval, tvec, ref):
    """Piecewise-linear interpolation with end-extrapolation.

    Parity with the template ``linear_interpolation``
    (TrajectoryOptimizer.hpp:239-257): outside [tvec[0], tvec[-1]] the first
    or last segment is extrapolated. ``tval`` may be a scalar or an array;
    ``tvec`` [K] must be ascending; ``ref`` is [K] or [K, d].
    """
    tvec = jnp.asarray(tvec)
    ref = jnp.asarray(ref)
    tval = jnp.asarray(tval)
    k = tvec.shape[0]
    j = jnp.clip(jnp.searchsorted(tvec, tval, side="right") - 1, 0, k - 2)
    t0 = tvec[j]
    t1 = tvec[j + 1]
    r0 = ref[j]
    r1 = ref[j + 1]
    denom = t1 - t0
    safe = jnp.where(denom == 0, 1.0, denom)
    w = jnp.where(denom == 0, 0.0, (tval - t0) / safe)
    if ref.ndim > tvec.ndim:
        w = w[..., None]
    return r0 + w * (r1 - r0)


def extract(traj: Traj, idxs: Sequence[int]) -> Traj:
    """extractTraj parity (TrajectoryOptimizer.hpp:267-282): index 0 selects
    the time column, i selects value column i-1."""
    times, values = traj
    cols = []
    for i in idxs:
        if i == 0:
            cols.append(jnp.asarray(times)[..., None])
        else:
            cols.append(jnp.asarray(values)[..., i - 1 : i])
    return times, jnp.concatenate(cols, axis=-1)


def scale(traj: Traj, scalers: Sequence[float]) -> Traj:
    """scaleTraj parity (TrajectoryOptimizer.hpp:291-303); columns beyond
    ``len(scalers)`` are untouched."""
    times, values = traj
    d = values.shape[-1]
    s = np.ones((d,))
    s[: len(scalers)] = np.asarray(scalers)[:d]
    return times, values * jnp.asarray(s, dtype=values.dtype)


def offset(traj: Traj, offsets: Sequence[float]) -> Traj:
    """offsetTraj parity (TrajectoryOptimizer.hpp:312-324)."""
    times, values = traj
    d = values.shape[-1]
    o = np.zeros((d,))
    o[: len(offsets)] = np.asarray(offsets)[:d]
    return times, values + jnp.asarray(o, dtype=values.dtype)


def _increment_path(fp: str) -> str:
    """No-overwrite filename policy (TrajectoryOptimizer.cpp:630-640):
    trailing digits of the stem are incremented until the path is free."""
    while os.path.exists(fp):
        dot = fp.find(".")
        stem, ext = (fp, "") if dot < 0 else (fp[:dot], fp[dot:])
        m = re.search(r"(\d+)$", stem)
        if m:
            idx = int(m.group(1)) + 1
            stem = stem[: m.start()] + str(idx)
        else:
            stem = stem + "1"
        fp = stem + ext
    return fp


def save(traj: Traj, fp: str) -> str:
    """CSV export parity (TrajectoryOptimizer.cpp:626-674): header
    ``time,traj0,...``; returns the (possibly incremented) path written."""
    times, values = traj
    times = np.asarray(times)
    values = np.asarray(values)
    if times.size == 0:
        print("No Data to Save!!!")
        return fp
    fp = _increment_path(fp)
    d = values.shape[-1]
    header = "time" + "".join(f",traj{i}" for i in range(d))
    with open(fp, "w") as fh:
        fh.write(header + "\n")
        rows = []
        for t, row in zip(times, values):
            rows.append(
                f"{float(t):.6f}" + "".join(f",{float(v):.6f}" for v in row)
            )
        fh.write("\n".join(rows))
    return fp


def load_csv(fp: str) -> Traj:
    """Read back a CSV written by :func:`save`."""
    data = np.loadtxt(fp, delimiter=",", skiprows=1)
    data = np.atleast_2d(data)
    return jnp.asarray(data[:, 0]), jnp.asarray(data[:, 1:])
