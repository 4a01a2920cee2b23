"""Multi-vehicle VGPs with inter-vehicle deconfliction.

BASELINE.json config 5: fleet MPC with deconfliction. A fleet of V
point-mass vehicles becomes ONE VGP with stacked states/controls
(nx = 2V, nu = 2V) plus pairwise minimum-separation path inequalities
g = d_min^2 - |p_i - p_j|^2 <= 0 — the deconfliction constraint the
reference has no analog for (it solves one vehicle per process).

Scenario batching then rides vmap on top: thousands of fleets, each a
deconflicted joint solve.
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.problem import VGP
from ..transcribe.nlp import NLP


def fleet_2d(
    n_vehicles: int = 3,
    nsteps: int = 24,
    dt: float = 0.25,
    d_min: float = 0.5,
    starts: Optional[Sequence[Tuple[float, float]]] = None,
    goals: Optional[Sequence[Tuple[float, float]]] = None,
    v_max: float = 1.5,
) -> Tuple[VGP, NLP]:
    """V single-integrator vehicles crossing paths, joint solve with
    pairwise separation. Default scenario: vehicles start on a circle
    and swap to antipodal goals (max conflict)."""
    V = n_vehicles
    if starts is None:
        ang = np.linspace(0.0, 2 * np.pi, V, endpoint=False)
        starts = np.stack([3 + 2.5 * np.cos(ang), 3 + 2.5 * np.sin(ang)],
                          axis=-1)
        goals = np.stack(
            [3 + 2.5 * np.cos(ang + np.pi), 3 + 2.5 * np.sin(ang + np.pi)],
            axis=-1,
        )
    starts = np.asarray(starts, dtype=float)
    goals = np.asarray(goals, dtype=float)

    vgp = VGP(nsteps=nsteps, dt=dt)
    vgp.x0 = starts.reshape(-1).tolist()
    vgp.xf = goals.reshape(-1).tolist()
    vgp.xtol = [0.05] * (2 * V)
    vgp.xlower = [-10.0] * (2 * V)
    vgp.xupper = [10.0] * (2 * V)
    vgp.ulower = [-v_max] * (2 * V)
    vgp.uupper = [v_max] * (2 * V)

    pairs = list(itertools.combinations(range(V), 2))
    d2 = d_min * d_min

    def dynamics(x, u, t, data):
        return u

    def separation(x, u, t, data):
        # d_min^2 - |p_i - p_j|^2 <= 0 for every pair, normalized
        vals = []
        for i, j in pairs:
            pi = x[2 * i : 2 * i + 2]
            pj = x[2 * j : 2 * j + 2]
            dist2 = jnp.sum((pi - pj) ** 2)
            vals.append((d2 - dist2) / d2)
        return jnp.stack(vals)

    nlp = NLP(
        dims=vgp.dims(),
        dynamics=dynamics,
        running_cost=lambda x, u, t, d: jnp.sum(u * u),
        path_ineq=(separation,),
        scheme="trapezoidal",
        use_obstacles=False,
    )
    return vgp, nlp


def min_pairwise_distance(X: jnp.ndarray, n_vehicles: int) -> jnp.ndarray:
    """Min over time and pairs of inter-vehicle distance; X is [K, 2V]."""
    V = n_vehicles
    P = X.reshape(X.shape[0], V, 2)
    dmin = jnp.inf
    for i, j in itertools.combinations(range(V), 2):
        d = jnp.sqrt(jnp.sum((P[:, i] - P[:, j]) ** 2, axis=-1))
        dmin = jnp.minimum(dmin, jnp.min(d))
    return dmin
