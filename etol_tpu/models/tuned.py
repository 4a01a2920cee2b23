"""Measured per-model solver configurations.

The library's :class:`~etol_tpu.solve.al_sqp.SolverConfig` defaults are
deliberately conservative (rho0=10, generous budgets). The canonical
model families each have a MEASURED sweet spot — swept on a TPU v5e
against the batched iteration-CDF methodology of ``docs/perf.md``
(phase-1 budget near the CDF median, compaction stages sized so their
lane capacity holds the measured tail and their cumulative budget
passes the max). This module records those results so users get the
benchmarked configuration with one call instead of re-sweeping.

Numbers: tools/fw_diag_r4.py, tools/fw_tpu_r4.py, tools/warm_r4.py,
tools/sweep_r3.py; throughputs in README.md's ladder table.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from ..solve.al_sqp import SolverConfig

# name -> (SolverConfig overrides, compaction stages as (divisor,
# budget) pairs: capacity = B // divisor)
_TUNED = {
    # double_integrator_2d N=20 (B=1024 tail CDF: p50 45 / p99 233 /
    # max 357) -> 2683 solves/s/chip
    "double_integrator_2d": (
        dict(max_outer=64, rho0=1000.0, rho_growth=3.16,
             lm_rule="ratio", round_viol_patience=4, max_total=90),
        ((4, 128), (16, 384)),
    ),
    # uas_2d N=50 with 512 shooting seeds (CDF p50 83 / p99 133)
    # -> 1213 cold, 5107 warm solves/s/chip
    "uas_2d": (
        dict(max_outer=64, max_inner=100, rho0=1000.0,
             rho_growth=3.16, lm_rule="ratio", round_viol_patience=4,
             max_total=83),
        ((2, 32), (8, 96), (32, 1024)),
    ),
    # point_mass_3d N=40 (CDF p50 55 / p99 101 / max 175) -> 2002/s
    "point_mass_3d": (
        dict(max_outer=64, rho0=1000.0, rho_growth=3.16,
             lm_rule="ratio", round_viol_patience=4, max_total=70),
        ((4, 64), (16, 256)),
    ),
    # fixed_wing_3dof N=100 (CDF p50 92 / p99 103 at rho0=316; 1000 is
    # ~15% faster but lands ~10% worse objectives) -> 502/s at B=256
    "fixed_wing_3dof": (
        dict(max_outer=64, rho0=316.0, lm_rule="ratio",
             round_viol_patience=8, max_total=110),
        ((8, 96), (32, 512)),
    ),
}

# warm fleet-MPC re-solve phase for uas_2d (warm CDF p50 8 / p99 52 /
# max 116) -> 5107 warm solves/s at warm_solved 1.000
WARM_UAS_2D = (dict(max_total=20), ((8, 48), (32, 192)))


def tuned_config(
    model: str,
    batch: Optional[int] = None,
    kkt_solver: Optional[str] = None,
) -> Tuple[SolverConfig, tuple]:
    """Benchmarked (SolverConfig, stages) for a canonical model family.

    ``batch`` resolves the stage divisors into absolute lane counts for
    :func:`etol_tpu.solve.al_sqp.solve_batched_staged` (pass None to
    get the raw (divisor, budget) pairs). ``kkt_solver`` defaults to
    the Pallas kernel on TPU, scan elsewhere — the same choice the
    bench makes.
    """
    if model not in _TUNED:
        raise KeyError(
            f"no tuned config for {model!r}; known: {sorted(_TUNED)}"
        )
    overrides, stages = _TUNED[model]
    if kkt_solver is None:
        kkt_solver = (
            "pallas" if jax.default_backend() == "tpu" else "scan"
        )
    cfg = SolverConfig(kkt_solver=kkt_solver, **overrides)
    if batch is not None:
        stages = tuple(
            (max(batch // dv, 1), bd) for dv, bd in stages
        )
    return cfg, stages


def warm_config(
    base: SolverConfig, batch: Optional[int] = None
) -> Tuple[SolverConfig, tuple]:
    """Benchmarked warm fleet-MPC re-solve phase (uas_2d-class): the
    phase budget + tail-aware ladder measured at 4.2x the cold
    throughput (tools/warm_r4.py)."""
    overrides, stages = WARM_UAS_2D
    cfg = dataclasses.replace(base, **overrides)
    if batch is not None:
        stages = tuple(
            (max(batch // dv, 1), bd) for dv, bd in stages
        )
    return cfg, stages
