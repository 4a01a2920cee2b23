"""Mesh construction and batch-axis sharded solving.

Scaling model (How-to-Scale recipe): pick a mesh, annotate shardings on
the inputs, let XLA insert collectives. For batched VGP solving the batch
axis is pure data parallelism — lanes never communicate — so sharding the
leading axis of every :class:`~etol_tpu.core.problem.VGPData` leaf (and
the warm-start state) partitions the whole solve with zero collectives;
ICI is only touched by result gathers the caller requests.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import VGPData
from ..solve import SolverConfig, al_sqp
from ..transcribe.nlp import NLP


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("batch",),
) -> Mesh:
    """A device mesh; default: 1D over all devices, axis "batch"."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_spec(mesh: Mesh, axis: str = "batch") -> P:
    return P(axis)


def shard_batch(data: VGPData, mesh: Mesh, axis: str = "batch") -> VGPData:
    """Place a batched VGPData (leading batch axis on every leaf) with the
    batch axis sharded over ``axis``."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, data)


def solve_sharded(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    mesh: Mesh,
    axis: str = "batch",
    z0=None,
    lam0=None,
):
    """jit-compiled batched solve with the batch axis sharded over the
    mesh. The per-lane solver is identical to the single-chip path; XLA
    partitions the vmapped program over ``axis``."""
    data = shard_batch(data, mesh, axis)

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def run(nlp_, cfg_, data_, z0_, lam0_):
        return al_sqp.solve_batched.__wrapped__(nlp_, cfg_, data_, z0_, lam0_)

    return run(nlp, cfg, data, z0, lam0)
