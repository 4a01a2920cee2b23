"""Shared types for the ETOL-TPU framework.

TPU-native rethink of the reference's type layer
(``include/ETOL/ETOL_Types.hpp``): instead of ``std::any``-erased scalars and
per-backend expression types, every cross-cutting concept is either

* a **static** Python dataclass that parameterises compilation (shapes,
  counts, flags), hashable so it can ride through ``jax.jit`` static args, or
* a **pytree of fixed-shape arrays** that rides through ``jit``/``vmap``/
  ``pjit`` as data.

Reference parity map (file:line refer to /root/reference):
- ``var_t`` (ETOL_Types.hpp:31-35)           -> :class:`VarType`
- ``param_configs_t`` (ETOL_Types.hpp:40-46) -> :class:`ParamConfig`
- ``traj_t`` (ETOL_Types.hpp:90-95)          -> plain ``(time, values)``
  arrays, see :mod:`etol_tpu.core.trajectory`
- ``track_t`` (ETOL_Types.hpp:102-105)       -> padded arrays in
  :class:`etol_tpu.core.problem.TrackData`
- ``border_t/region_t`` (ETOL_Types.hpp:83,108) -> numpy polygon lists in
  :mod:`etol_tpu.core.geometry`
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class VarType(enum.IntEnum):
    """Variable kinds, mirroring the reference enum ``var_t``.

    The reference spells integer as ``INTERGER`` (ETOL_Types.hpp:33); we keep
    the canonical spelling and accept both in the XML loader.
    """

    CONTINUOUS = 0
    INTEGER = 1
    BINARY = 2

    @classmethod
    def from_xml(cls, s: str) -> "VarType":
        s = s.strip().upper()
        if s in ("C", "CONTINUOUS"):
            return cls.CONTINUOUS
        if s in ("I", "INTEGER", "INTERGER"):
            return cls.INTEGER
        if s in ("B", "BINARY"):
            return cls.BINARY
        raise ValueError(f"unknown vartype {s!r}")

    def to_xml(self) -> str:
        return {0: "C", 1: "I", 2: "B"}[int(self)]


@dataclasses.dataclass(frozen=True)
class ParamConfig:
    """A custom (auxiliary) variable's configuration.

    Mirrors ``param_configs_t`` (ETOL_Types.hpp:40-46): bounds plus an
    activation window ``[t_start, t_stop]`` in which the variable exists.
    In the TPU build these become masked dense columns rather than
    name-indexed solver variables.
    """

    var_type: VarType = VarType.CONTINUOUS
    lower: float = 0.0
    upper: float = 0.0
    t_start: float = 0.0
    t_stop: float = 0.0


@dataclasses.dataclass(frozen=True)
class Dims:
    """Static shape descriptor of a transcribed VGP.

    Everything XLA needs to know at trace time lives here; it is hashable and
    passed as a static argument. Variable-count features of the reference
    (obstacle corners, track waypoints) are padded to the maxima recorded
    here and masked at run time.
    """

    nx: int                  # number of states (reference: _nStates)
    nu: int                  # number of controls (reference: _nControls)
    nsteps: int              # N; horizon has N+1 nodes (reference: _nSteps)
    rhorizon: int = 1        # steps clamped to the initial state
    max_ellipses: int = 0    # padded static-obstacle edge-ellipse count
    max_halfspaces: int = 0  # padded per-convex-piece halfplane count
    max_pieces: int = 0      # padded convex-piece count
    max_tracks: int = 0      # padded moving-obstacle count
    max_waypoints: int = 2   # padded waypoints per track
    n_params: int = 0        # auxiliary per-node decision variables
                             # (param_configs_t, ETOL_Types.hpp:40-46):
                             # masked dense columns appended to each
                             # node's [x, u] slot, active only inside
                             # their [t_start, t_stop] window (the
                             # reference creates one named solver var per
                             # in-window timestep, eGLPK.cpp:275-332)
    # NOTE: user path-constraint counts are NOT recorded here — the solver
    # derives them by abstract evaluation of the NLP callbacks
    # (al_sqp._result_sizes), so there is nothing to keep in sync.

    @property
    def nodes(self) -> int:
        return self.nsteps + 1

    @property
    def node_width(self) -> int:
        """Decision-variable count per node: [x, u, params]."""
        return self.nx + self.nu + self.n_params

    @property
    def nz(self) -> int:
        """Flat decision-vector length: states, controls and param
        columns at every node."""
        return self.nodes * self.node_width


class Status(enum.IntEnum):
    """Per-problem solve status carried in the batch.

    The reference exits the process on solver failure
    (TrajectoryOptimizer.cpp:1812-1817) or silently skips trajectory
    extraction (eGLPK.cpp:68). A batched solver cannot do either: each lane
    gets a status code instead.
    """

    RUNNING = 0
    SOLVED = 1
    MAX_ITER = 2
    INFEASIBLE = 3
    DIVERGED = 4


def default_float():
    import jax.numpy as jnp

    return jnp.float32
