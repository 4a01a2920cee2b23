"""Batched randomized shooting planner — the eOMPL replacement.

The reference's sampling backend (eOMPL, SURVEY.md §2 C9) grows a single
kinodynamic tree (RRT/SST/EST/KPIECE/PDST) with a ray-cast validity
checker, one rollout at a time. The TPU-idiomatic equivalent evaluates
*thousands* of candidate control sequences in parallel: sample controls
in bounds, roll the dynamics forward with `lax.scan`, mask out rollouts
that enter an exclusion zone (same collision predicate as the NLP), and
keep the best by goal distance + control effort.

Uses: a standalone coarse planner (eOMPL parity), and a collision-free
initial-guess generator for the AL-SQP (the role OMPL often plays for
collocation solvers).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.problem import VGPData
from ..transcribe import obstacles as obs_mod
from ..transcribe.nlp import NLP


def rollout(dynamics: Callable, x0, U, dt, data, method: str = "rk2"):
    """Integrate ``xdot = f(x, u, t)`` under piecewise-constant controls.

    U is [N, nu]; returns X [N+1, nx]. ``rk2`` (midpoint) keeps the
    rollout consistent with trapezoidal collocation to O(dt^2); ``euler``
    matches the MILP difference equation.
    """

    def step(carry, inp):
        x, t = carry
        u = inp
        if method == "euler":
            xn = x + dt * dynamics(x, u, t + dt, data)
        else:
            k1 = dynamics(x, u, t, data)
            k2 = dynamics(x + 0.5 * dt * k1, u, t + 0.5 * dt, data)
            xn = x + dt * k2
        return (xn, t + dt), xn

    (_, _), X = jax.lax.scan(step, (x0, jnp.zeros((), x0.dtype)), U)
    return jnp.concatenate([x0[None], X], axis=0)


def _collision_free(X, dt, data: VGPData) -> jnp.ndarray:
    """1.0 when no node of X (first two states) violates an obstacle."""
    K = X.shape[0]
    ts = jnp.arange(K, dtype=X.dtype) * dt

    def node_ok(x, t):
        g = obs_mod.collision_values(x[:2], t, data.obstacles, data.tracks)
        return jnp.all(g <= 0.0)

    return jnp.all(jax.vmap(node_ok)(X, ts))


def _pulled_controls(
    dynamics: Callable,
    nsteps: int,
    data: VGPData,
    n_samples: int,
    n_cand: int,
    key: jax.Array,
    noise: float = 0.15,
    margin: float = 0.0,
    greedy_effort: float = 0.0,
):
    """Goal-pulled rollout family (r4 headline-tail measurement,
    docs/perf.md): each rollout greedily steers toward the goal — at
    every step it draws ``n_cand`` candidate controls, integrates one
    step each, and keeps the one minimizing the xtol-weighted distance
    to the goal plus an obstacle/box penalty (free-at-goal states, large
    xtol, barely weigh in — the uas heading, for instance). Candidate
    randomness plus a relative score jitter (``noise``) keeps the family
    diverse enough to fan around obstacles instead of collapsing onto
    one greedy path. Returns U [S, N, nu].

    The measured motivation: with pure random walks the slow solver
    lanes' best seed ends ~4.1 from the goal vs ~3.0 for fast lanes
    (corr(iterations, seed-to-goal distance) = +0.30); pulled rollouts
    close the seed-to-goal gap for the tail.
    """
    dt = data.dt
    nu = data.u_lb.shape[0]
    # xtol-weighted goal metric: tight-band states dominate, free
    # states (large xtol) vanish
    wgt = 1.0 / (data.xtol + 0.1) ** 2

    def one(k):
        def step(carry, kt):
            x, t = carry
            ku, kn = jax.random.split(kt)
            cand = jax.random.uniform(
                ku, (n_cand, nu), x.dtype, data.u_lb, data.u_ub
            )

            uspan = data.u_ub - data.u_lb

            def eval_c(u):
                k1 = dynamics(x, u, t, data)
                k2 = dynamics(
                    x + 0.5 * dt * k1, u, t + 0.5 * dt, data
                )
                xn = x + dt * k2
                g = obs_mod.collision_values(
                    xn[:2], t + dt, data.obstacles, data.tracks
                )
                pen = jnp.where(jnp.any(g > 0.0), 1e6, 0.0)
                # graded stand-off: discourage (without forbidding)
                # candidates within `margin` of an obstacle boundary —
                # boundary-hugging seeds start the NLP on the active
                # set with zero multipliers, the measured slow-lane mode
                pen += 10.0 * jnp.sum(jnp.maximum(g + margin, 0.0))
                pen += jnp.where(
                    jnp.all((xn >= data.x_lb) & (xn <= data.x_ub)),
                    0.0, 1e6,
                )
                eff = greedy_effort * jnp.sum((u / uspan) ** 2)
                return (
                    jnp.sum(wgt * (xn - data.xf) ** 2) + pen + eff,
                    xn,
                )

            scores, xns = jax.vmap(eval_c)(cand)
            # relative jitter: diversifies WHICH good candidate wins
            # without ever promoting a blocked one over a free one
            scores = scores * (
                1.0 + noise * jax.random.normal(kn, (n_cand,), x.dtype)
            )
            i = jnp.argmin(scores)
            return (xns[i], t + dt), cand[i]

        ks = jax.random.split(k, nsteps)
        (_, _), U = jax.lax.scan(
            step, (data.x0, jnp.zeros((), data.x0.dtype)), ks
        )
        return U

    return jax.vmap(one)(jax.random.split(key, n_samples))


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 6, 7))
def plan(
    dynamics: Callable,
    nsteps: int,
    data: VGPData,
    n_samples: int = 4096,
    key: Optional[jax.Array] = None,
    goal_weight: float = 10.0,
    pulled: int = 0,
    n_cand: int = 8,
    effort_weight: float = 0.1,
    pulled_margin: float = 0.0,
    pulled_effort: float = 0.0,
):
    """Sample ``n_samples`` control sequences, return the best rollout.

    ``pulled`` adds that many goal-pulled greedy rollouts
    (:func:`_pulled_controls`) to the random-walk family; all candidates
    compete under the same score. Returns (X [K, nx], U_nodes [K, nu],
    info) where info carries the per-sample scores; U_nodes repeats the
    step controls onto nodes so the result packs directly into a
    collocation decision vector.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    nu = data.u_lb.shape[0]
    nx = data.x0.shape[0]
    dt = data.dt

    # smooth random walks in control space explore better than iid noise
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(
        k1, (n_samples, 1, nu), minval=data.u_lb, maxval=data.u_ub
    )
    steps = jax.random.uniform(
        k2,
        (n_samples, nsteps, nu),
        minval=-0.3 * (data.u_ub - data.u_lb),
        maxval=0.3 * (data.u_ub - data.u_lb),
    )
    U = jnp.clip(
        base + jnp.cumsum(steps, axis=1), data.u_lb, data.u_ub
    )  # [S, N, nu]
    if pulled:
        Up = _pulled_controls(
            dynamics, nsteps, data, pulled, n_cand, k3,
            margin=pulled_margin, greedy_effort=pulled_effort,
        )
        U = jnp.concatenate([U, Up], axis=0)

    def eval_one(Uk):
        X = rollout(dynamics, data.x0, Uk, dt, data)
        ok = _collision_free(X, dt, data)
        in_box = jnp.all((X >= data.x_lb) & (X <= data.x_ub))
        goal = jnp.sum((X[-1] - data.xf) ** 2)
        effort = jnp.mean(Uk**2)
        score = (
            goal_weight * goal
            + effort_weight * effort
            + jnp.where(ok & in_box, 0.0, 1e6)
        )
        return score, X

    scores, Xs = jax.vmap(eval_one)(U)
    best = jnp.argmin(scores)
    Xb, Ub = Xs[best], U[best]
    U_nodes = jnp.concatenate([Ub[:1], Ub], axis=0)  # [K, nu]
    info = dict(
        scores=scores,
        best=best,
        valid_fraction=jnp.mean(scores < 1e6),
    )
    return Xb, U_nodes, info


def plan_guess(nlp: NLP, data: VGPData, n_samples: int = 4096, key=None,
               pulled: int = 0, n_cand: int = 8, **kw):
    """Shooting-based initial guess for the AL-SQP: best collision-free
    rollout packed as a decision vector z. ``pulled`` adds goal-pulled
    greedy rollouts to the candidate family (docs/perf.md: the measured
    lever for the slow-lane tail); ``pulled_margin``/``pulled_effort``
    pass through to :func:`_pulled_controls`."""
    X, U, _ = plan(nlp.dynamics, nlp.dims.nsteps, data, n_samples, key,
                   pulled=pulled, n_cand=n_cand, **kw)
    return jnp.concatenate([X, U], axis=-1).reshape(-1)
