"""Multi-host execution: jax.distributed over ICI/DCN.

The reference has no distributed backend at all (SURVEY.md §2a); the
TPU build's prescription is `jax.distributed` + pjit/shard_map — the
BATCH axis spans hosts over DCN (problems are independent; the only
cross-host traffic is result gathering), while horizon-axis collectives
(parallel/kkt.py) stay inside a slice on ICI. Mesh construction orders
axes so that is what happens: batch outermost (host-major), horizon
innermost (chip-major).

Usage on each host of a pod/multi-host job::

    from etol_tpu.parallel import distributed, mesh as pmesh
    distributed.initialize()          # env-driven (TPU pods: automatic)
    m = distributed.global_mesh(("batch",))
    res = pmesh.solve_sharded(nlp, cfg, bdata, m)     # parallel/mesh.py

CPU testing without hardware: two processes with gloo TCP collectives
(tests/test_distributed.py) — the standard JAX multi-process pattern.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or bootstrap) the multi-process JAX runtime.

    On TPU pods all arguments come from the environment and this is a
    plain passthrough to :func:`jax.distributed.initialize`. On CPU
    fleets pass them explicitly (or via ``ETOL_COORDINATOR`` /
    ``ETOL_NUM_PROCS`` / ``ETOL_PROC_ID``). Safe to call once per
    process, before any backend use.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "ETOL_COORDINATOR"
    )
    if num_processes is None and os.environ.get("ETOL_NUM_PROCS"):
        num_processes = int(os.environ["ETOL_NUM_PROCS"])
    if process_id is None and os.environ.get("ETOL_PROC_ID"):
        process_id = int(os.environ["ETOL_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(
    axes: Tuple[str, ...] = ("batch",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Mesh over ALL global devices (every process sees the same mesh).

    Host-major device order: with ``axes=("batch", "horizon")`` the
    batch axis splits across processes (DCN) and the horizon axis stays
    within each process's local devices (ICI) — independent problems
    never ride the slow links; the KKT/halo collectives ride the fast
    ones. ``shape`` defaults to (n_processes-major) factorization:
    batch = process count x remaining, later axes fill the local chips.
    """
    devs = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    n = len(devs)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            nproc = jax.process_count()
            local = max(n // nproc, 1)
            shape = (nproc, local)
        else:
            raise ValueError("pass an explicit shape for >2 axes")
    if int(np.prod(shape)) != n:
        raise ValueError(
            f"mesh shape {shape} != {n} global devices"
        )
    return Mesh(np.asarray(devs).reshape(shape), axes)


def process_local_batch(global_batch: int) -> Tuple[int, int]:
    """(local_batch, offset) for this process's slice of a globally
    sharded problem batch — feed each host its own lanes and let
    `jax.make_array_from_process_local_data` assemble the global array.
    """
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(
            f"global batch {global_batch} must divide process count "
            f"{nproc}"
        )
    lb = global_batch // nproc
    return lb, lb * jax.process_index()
