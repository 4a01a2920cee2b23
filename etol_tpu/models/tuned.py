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
    # double_integrator_2d N=20, r5 pieces containment: CDF p50 45 ->
    # 25, max 357 -> 33 (B=256 CPU) at 11% BETTER objectives (the band
    # inflation was costing 4.485 -> 4.024); on-chip solved 1.0000 ->
    # 11378 solves/s/chip (was 2586) — the deep B/32 tail stage closes
    # the last ~0.2% of lanes at trivial cost
    # + the r5 schedule retune (rho0 3160 / growth 5.6, like uas):
    # CDF p50 25 -> 18; on-chip 14820 solves/s at solved 1.0000
    # (budget 18 strands 10% — 20 is the knee)
    "double_integrator_2d": (
        dict(max_outer=64, rho0=3160.0, rho_growth=5.6,
             lm_rule="ratio", round_viol_patience=4, max_total=20,
             ls_grid=16, ls_backtracks=16),
        ((4, 10), (32, 256)),
    ),
    # uas_2d N=50, r5 retune: obstacle exclusion through the
    # convex-piece softmin containment alone (obstacle_form="pieces" —
    # the reference MILP's node-wise semantics; see _MODEL_EXTRAS)
    # halves the iteration CDF (B=256: p50 85 -> 48, p99 176 -> 64 at
    # equal objectives), and 256 walk + 16 goal-pulled seeds shift it
    # again (p50 41). Swept on-chip (tools/uas_r5.py): solved 1.0000
    # across 8 scattered batches -> 2736 cold / 9945 warm solves/s/chip
    # ls_grid=16: under pieces containment the dense 24-alpha grid is
    # unnecessary (solved 1.0000 down to ls12 on CPU; the dense-grid
    # need was a band-row pathology) and 16 is the on-chip sweet spot
    # (2730 -> 2835 cold, 9964 -> 10398 warm; ls12 is SLOWER than ls24
    # on-chip — XLA tiling, keep 16)
    # r5 schedule retune on the pieces CDF: rho0=3160 + growth 5.6
    # moves the CDF to p50 32 / p99 47 / max 60 at BETTER objectives
    # (10.677 vs 10.738 solved-lane mean) — the old "high rho0 is
    # harmful" finding was another band-row artifact. On-chip: 3405
    # cold / 14813 warm solves/s, solved 1.0000 across 8 batches.
    "uas_2d": (
        dict(max_outer=64, max_inner=100, rho0=3160.0,
             rho_growth=5.6, lm_rule="ratio", round_viol_patience=4,
             max_total=33, ls_grid=16, ls_backtracks=16),
        ((2, 16), (8, 32), (32, 96)),
    ),
    # point_mass_3d N=40, r5: sep_assembly (trapezoidal) + ls16 + the
    # rho0 3160 / growth 5.6 schedule (CDF p50 54 -> 42, max 175 -> 80
    # at equal objectives) -> 4724 solves/s on-chip at solved 1.0000
    "point_mass_3d": (
        dict(max_outer=64, rho0=3160.0, rho_growth=5.6,
             lm_rule="ratio", round_viol_patience=4, max_total=42,
             ls_grid=16, ls_backtracks=16),
        ((2, 16), (8, 32), (32, 96)),
    ),
    # fixed_wing_3dof N=100, r5: radau scheme (the r4-measured ~10%
    # shipped at last) + chord_steps=2 — the obstacle-free fw is where
    # Shamanskii reuse steps trade well (assemblies p50 92 -> 40 at
    # +30% substeps; stale blocks stay valid without an active-set
    # churn). On-chip B=256: 501 -> 848 solves/s at solved 1.0000;
    # objectives land ~1.2% higher (0.9654 -> 0.9767 mean) — the
    # composite iteration walks a slightly different path; a full-
    # Newton polish stage was measured WORSE (docs/perf.md r5).
    # rho0=316 kept (1000 is ~15% faster, ~10% worse objectives, r4).
    "fixed_wing_3dof": (
        dict(max_outer=64, rho0=316.0, lm_rule="ratio",
             round_viol_patience=8, max_total=124, chord_steps=2,
             ls_grid=16, ls_backtracks=16),
        ((2, 18), (8, 64), (32, 256)),
    ),
}

# warm fleet-MPC re-solve phase for uas_2d. r5 (pieces containment +
# the rho0=3160/g5.6 cold schedule): warm CDF p50 2 / p90 3 / p99 6 /
# max 22 -> budget 7 + the ladder below = 14813 warm solves/s at
# warm_solved 1.0000 (budget 6: 16.4k/s but strands 0.14%)
WARM_UAS_2D = (dict(max_total=7), ((8, 24), (32, 96)))

# model-level transcription/seed choices that pair with the solver
# configs above (the bench and examples read these; the library-wide
# NLP default stays the belt-and-braces obstacle_form="both")
_MODEL_EXTRAS = {
    # node-wise piece containment is the reference MILP's own
    # semantics (per-timestep big-M side rows, eGLPK.cpp:190-246; its
    # NSIDES square approximations are node-wise too) and each piece
    # value is CONSERVATIVE (softmin inflation, obstacles.py
    # piece_values) — solved lanes sit strictly outside every piece at
    # every node. The edge-ellipse bands (the reference NLP example's
    # form) double-cover the boundary but their concave rows are what
    # drag the AL iteration count (docs/perf.md r5).
    "uas_2d": dict(obstacle_form="pieces", seed_walks=256,
                   seed_pulled=16),
    "double_integrator_2d": dict(obstacle_form="pieces"),
    # radau residuals measured ~10% faster than hermite-simpson on the
    # chip at identical iteration counts/quality (r4), and the chord
    # config above is swept against the radau CDF
    "fixed_wing_3dof": dict(scheme="radau"),
}


def tuned_extras(model: str) -> dict:
    """Model-level transcription/seed choices measured with the
    registry configs (empty when a model has none)."""
    return dict(_MODEL_EXTRAS.get(model, {}))


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
