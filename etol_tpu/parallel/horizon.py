"""Horizon (time-axis) sharding — the sequence-parallel analog.

The reference serializes over time steps in every transcription loop
(eGLPK.cpp:279, eGurobi.cpp:238) and never parallelizes the horizon
(SURVEY.md §5 "long-context"). Here the collocation-node axis shards
over a mesh axis: each device owns a contiguous block of nodes, the
defect that couples the last local node to the next device's first node
is computed after a one-node **halo exchange** (`lax.ppermute` — one hop
over ICI), and scalar reductions (AL value, violation norms) finish with
`psum`.

These evaluators are standalone building blocks (used by the driver's
multichip dry-run); the full horizon-sharded solve lives in
:mod:`etol_tpu.parallel.solve_sharded`, which pairs node-parallel
evaluation with the distributed SPIKE KKT factorization of
:mod:`etol_tpu.parallel.kkt`.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.problem import VGPData
from ..transcribe.nlp import NLP


def _halo_from_next(Z_local: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Return this shard's view of the *next* shard's first row (the
    node that closes our last defect). Last shard gets its own last row
    back (its trailing defect is masked out)."""
    n = lax.psum(1, axis)
    perm = [(i, (i - 1) % n) for i in range(n)]  # send first row left
    first = Z_local[:1]
    return lax.ppermute(first, axis, perm)


def sharded_defects(
    nlp: NLP, data: VGPData, mesh: Mesh, axis: str = "horizon"
):
    """Build a shard_map'd defect evaluator over the horizon axis.

    Returns ``f(Z) -> defects`` where Z is [K, w] with K = nodes sharded
    over ``axis`` (K % n_shards == 0) and the result is [K, nx]: row k
    holds the defect of step k (rows for the global last node are zero).
    """
    d = nlp.dims
    K, w = d.nodes, d.node_width
    n = mesh.shape[axis]
    assert K % n == 0, f"nodes ({K}) must divide the {axis} axis ({n})"
    kb = K // n

    def local(Z_local, data_):
        idx = lax.axis_index(axis)
        k0 = idx * kb
        halo = _halo_from_next(Z_local, axis)
        Z_ext = jnp.concatenate([Z_local, halo], axis=0)  # [kb+1, w]
        ks = k0 + jnp.arange(kb)
        defs = jax.vmap(
            lambda a, b, k: nlp.step_defect(a, b, k, data_)
        )(Z_ext[:-1], Z_ext[1:], ks)
        # the global last node opens no step
        valid = (ks < d.nsteps)[:, None]
        return jnp.where(valid, defs, 0.0)

    dspec = jax.tree.map(lambda _: P(), data)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), dspec),
        out_specs=P(axis, None),
    )


def sharded_al_pieces(
    nlp: NLP, data: VGPData, mesh: Mesh, axis: str = "horizon"
):
    """shard_map'd (cost, defect-norm) evaluator over the horizon axis:
    per-shard partial sums finished with `psum` — the per-collocation-block
    partial-reduction pattern of BASELINE.json."""
    d = nlp.dims
    K = d.nodes
    n = mesh.shape[axis]
    assert K % n == 0
    kb = K // n

    def local(Z_local, data_):
        idx = lax.axis_index(axis)
        k0 = idx * kb
        ks = k0 + jnp.arange(kb)
        cost = jnp.sum(
            jax.vmap(lambda zn, k: nlp.node_cost(zn, k, data_))(Z_local, ks)
        )
        halo = _halo_from_next(Z_local, axis)
        Z_ext = jnp.concatenate([Z_local, halo], axis=0)
        defs = jax.vmap(
            lambda a, b, k: nlp.step_defect(a, b, k, data_)
        )(Z_ext[:-1], Z_ext[1:], ks)
        valid = (ks < d.nsteps)[:, None]
        defs = jnp.where(valid, defs, 0.0)
        cost = lax.psum(cost, axis)
        viol = lax.psum(jnp.sum(defs**2), axis)
        return cost, viol

    dspec = jax.tree.map(lambda _: P(), data)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), dspec),
        out_specs=(P(), P()),
    )
