"""Horizon-sharded AL-SQP: one long-horizon problem over a device mesh.

The batch axis scales throughput; THIS axis scales the problem itself —
the sequence-parallel analog (SURVEY.md §2a/§5: the reference serializes
every transcription loop over time, eGLPK.cpp:279). Here the node axis
of a single VGP shards over ``mesh[axis]``:

* residual / cost / gradient / Hessian-block evaluation is node-local
  (or nearest-neighbor) math under ``jit`` — XLA's SPMD partitioner
  splits it across the mesh from the sharding constraints alone;
* the one genuinely sequential piece, the block-tridiagonal KKT
  factorization, runs as the SPIKE/Schur partitioned elimination of
  :mod:`etol_tpu.parallel.kkt` (shard-local factor + one psum'd
  separator system + one ppermute halo);
* AD of the AL value differentiates straight through the shard_map'd
  pieces (JAX inserts the transposed collectives).

Use for horizons far beyond one device's sweet spot (K in the
thousands) or to cut the O(K) factorization latency of very long MPC
problems. For fleets of small problems, shard the batch axis instead
(parallel/mesh.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import VGPData
from ..solve import al_sqp
from ..transcribe.nlp import NLP
from . import kkt


def solve_horizon_sharded(
    nlp: NLP,
    cfg: al_sqp.SolverConfig,
    data: VGPData,
    mesh: Mesh,
    axis: str = "horizon",
    z0: Optional[jax.Array] = None,
    lam0=None,
    rho0: Optional[jax.Array] = None,
) -> al_sqp.SolveResult:
    """Solve ONE VGP with its node axis sharded over ``mesh[axis]``.

    Semantics identical to :func:`etol_tpu.solve.al_sqp.solve` (same
    flattened AL loop, same result pytree); K = nodes must divide the
    axis size with >= 2 nodes per shard. The solution matches the
    single-device solve up to f32 reduction-order noise.
    """
    d = nlp.dims
    n = mesh.shape[axis]
    if d.nodes % n or d.nodes // n < 2:
        raise ValueError(
            f"nodes ({d.nodes}) must divide the {axis} axis ({n}) with "
            ">= 2 nodes per shard"
        )
    if z0 is None:
        z0 = nlp.initial_guess(data)
    if lam0 is None:
        lam0 = al_sqp.init_multipliers(nlp, data)

    kkt_solve = kkt.make_solver(mesh, axis)

    @functools.partial(jax.jit, static_argnums=())
    def run(data_, z0_, lam0_, rho0_):
        # pin the decision vector's node axis to the mesh so the SPMD
        # partitioner splits every node-parallel evaluation; the
        # shard_map'd KKT solve anchors the layout
        Z = z0_.reshape(d.nodes, -1)
        Z = jax.lax.with_sharding_constraint(
            Z, NamedSharding(mesh, P(axis, None))
        )
        return al_sqp._solve_single(
            nlp, cfg, data_, Z.reshape(-1), lam0_, rho0_,
            kkt_solve=kkt_solve,
        )

    with mesh:
        return run(data, z0, lam0, rho0)
