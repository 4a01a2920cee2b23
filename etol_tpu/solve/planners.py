"""Named sampling-based planners — eOMPL's planner registry, TPU-style.

The reference's eOMPL backend selects a kinodynamic planner by name
{RRT, SST, EST, KPIECE, PDST} (eOMPL.cpp:121-159) and grows ONE tree,
one propagation at a time, with a ray-cast validity checker.  A TPU
re-think keeps the planner *names* (and their exploration biases) but
replaces serial tree growth with fixed-shape batched programs:

========  =============================================================
name      algorithm here
========  =============================================================
PDST      pure batched random shooting (density-guided shooting in
          OMPL; here: thousands of smooth random-walk control
          sequences scored at once — :func:`etol_tpu.solve.shooting.plan`)
SST       iterative *selective* refinement: cross-entropy method over
          control sequences (rounds of sample → keep sparse elite set →
          refit, the batched analog of SST's prune-dominated-witnesses
          loop)
RRT       batched kinodynamic tree, Voronoi-biased parent selection
          (nearest node to a random target state)
EST       same tree, parents sampled inversely to local node density
KPIECE    same tree, parents sampled inversely to coverage-grid cell
          occupancy (coarse (x, y) grid)
========  =============================================================

All planners return ``(X [K, nx], U_nodes [K, nu], info)`` exactly like
:func:`shooting.plan`, so any of them can seed the AL-SQP
(``plan_guess(..., planner="RRT")``) or stand alone as the eOMPL-parity
coarse solver.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.problem import VGPData
from . import shooting

PLANNERS = ("RRT", "SST", "EST", "KPIECE", "PDST")


def plan(
    name: str,
    dynamics: Callable,
    nsteps: int,
    data: VGPData,
    n_samples: int = 1024,
    key: Optional[jax.Array] = None,
    **kw,
):
    """Dispatch by planner name (case-insensitive), eOMPL setPlanner
    parity (eOMPL.cpp:121-159)."""
    name = name.strip().upper()
    if key is None:
        key = jax.random.PRNGKey(0)
    if name == "PDST":
        return shooting.plan(dynamics, nsteps, data, n_samples, key, **kw)
    if name == "SST":
        return _plan_cem(dynamics, nsteps, data, n_samples, key, **kw)
    if name in ("RRT", "EST", "KPIECE"):
        return _plan_tree(
            dynamics, nsteps, data, n_samples, key, select=name, **kw
        )
    raise ValueError(f"unknown planner {name!r}; choose from {PLANNERS}")


def plan_guess(
    nlp,
    data: VGPData,
    n_samples: int = 1024,
    key=None,
    planner: str = "PDST",
    **kw,
):
    """Planner-seeded initial guess packed as a decision vector z."""
    X, U, _ = plan(
        planner, nlp.dynamics, nlp.dims.nsteps, data, n_samples, key, **kw
    )
    return jnp.concatenate([X, U], axis=-1).reshape(-1)


# ---------------------------------------------------------------------------
# SST analog: cross-entropy refinement over control sequences
# ---------------------------------------------------------------------------


def _score_rollout(dynamics, data, dt, goal_weight, effort_weight):
    def eval_one(Uk):
        X = shooting.rollout(dynamics, data.x0, Uk, dt, data)
        ok = shooting._collision_free(X, dt, data)
        in_box = jnp.all((X >= data.x_lb) & (X <= data.x_ub))
        goal = jnp.sum((X[-1] - data.xf) ** 2)
        effort = jnp.mean(Uk**2)
        score = (
            goal_weight * goal
            + effort_weight * effort
            + jnp.where(ok & in_box, 0.0, 1e6)
        )
        return score, X

    return eval_one


@functools.partial(
    jax.jit,
    static_argnames=("dynamics", "nsteps", "n_samples", "n_rounds",
                     "n_elite"),
)
def _plan_cem(
    dynamics: Callable,
    nsteps: int,
    data: VGPData,
    n_samples: int,
    key: jax.Array,
    n_rounds: int = 8,
    n_elite: int = 64,
    goal_weight: float = 10.0,
    effort_weight: float = 0.1,
):
    """Cross-entropy method: iteratively refit a per-step Gaussian over
    control sequences to the elite set — the batched analog of SST's
    keep-the-sparse-best loop."""
    nu = data.u_lb.shape[0]
    dt = data.dt
    span = data.u_ub - data.u_lb
    mid = 0.5 * (data.u_lb + data.u_ub)
    eval_one = _score_rollout(dynamics, data, dt, goal_weight,
                              effort_weight)

    mu0 = jnp.broadcast_to(mid, (nsteps, nu))
    sig0 = jnp.broadcast_to(0.5 * span, (nsteps, nu))

    def round_body(carry, k):
        mu, sig, best_score, best_U = carry
        eps = jax.random.normal(k, (n_samples, nsteps, nu), mu.dtype)
        U = jnp.clip(mu + sig * eps, data.u_lb, data.u_ub)
        scores, _ = jax.vmap(eval_one)(U)
        elite_idx = jnp.argsort(scores)[:n_elite]
        elite = U[elite_idx]
        mu = jnp.mean(elite, axis=0)
        # floor keeps late rounds exploring (SST never fully collapses
        # its witness set either)
        sig = jnp.std(elite, axis=0) + 0.02 * span
        i0 = elite_idx[0]
        better = scores[i0] < best_score
        best_score = jnp.where(better, scores[i0], best_score)
        best_U = jnp.where(better, U[i0], best_U)
        return (mu, sig, best_score, best_U), scores[i0]

    keys = jax.random.split(key, n_rounds)
    (mu, sig, best_score, best_U), round_best = jax.lax.scan(
        round_body,
        (mu0, sig0, jnp.asarray(jnp.inf, mu0.dtype),
         jnp.zeros((nsteps, nu), mu0.dtype)),
        keys,
    )
    X = shooting.rollout(dynamics, data.x0, best_U, dt, data)
    U_nodes = jnp.concatenate([best_U[:1], best_U], axis=0)
    info = dict(
        best_score=best_score,
        round_best=round_best,
        valid=best_score < 1e6,
    )
    return X, U_nodes, info


# ---------------------------------------------------------------------------
# batched kinodynamic tree (RRT / EST / KPIECE selection policies)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("dynamics", "nsteps", "n_samples", "select",
                     "batch", "ext_max", "grid"),
)
def _plan_tree(
    dynamics: Callable,
    nsteps: int,
    data: VGPData,
    n_samples: int,
    key: jax.Array,
    select: str = "RRT",
    batch: int = 64,
    ext_max: int = 4,
    grid: int = 16,
    goal_bias: float = 0.15,
    goal_weight: float = 10.0,
    effort_weight: float = 0.1,
):
    """Fixed-shape kinodynamic tree: capacity ``n_samples`` nodes, grown
    ``batch`` extensions at a time (each a short constant-control
    propagation, eOMPL's ODEBasicSolver analog).  ``select`` is the
    OMPL-style exploration bias:

    * RRT    — Voronoi bias: parent = nearest node to a random target
    * EST    — low-density bias: parent ~ 1 / (1 + #neighbors)
    * KPIECE — coverage bias: parent ~ 1 / (1 + its (x,y)-cell count)

    Every node stores its control *prefix* (zero-padded), so the best
    node replays as a full-horizon rollout; incomplete branches are
    scored by that padded replay — honest about tail collisions.
    """
    nx = data.x0.shape[0]
    nu = data.u_lb.shape[0]
    dt = data.dt
    dtype = data.x0.dtype
    M = n_samples
    batch = min(batch, max(M // 2, 1))
    n_iters = max((M - 1) // batch, 1)

    # node storage
    states0 = jnp.zeros((M, nx), dtype).at[0].set(data.x0)
    depth0 = jnp.zeros((M,), jnp.int32)
    ctrl0 = jnp.zeros((M, nsteps, nu), dtype)
    alive0 = jnp.zeros((M,), bool).at[0].set(True)

    span = data.x_ub - data.x_lb
    # density/coverage radius ~ a couple of grid cells
    r_nbr = 0.1 * jnp.sqrt(jnp.sum(span * span))

    def cell_of(x):
        f = jnp.clip((x[:2] - data.x_lb[:2]) / span[:2], 0.0, 1.0 - 1e-6)
        ij = (f * grid).astype(jnp.int32)
        return ij[0] * grid + ij[1]

    def grow(carry, k):
        states, depth, ctrl, alive = carry
        kt, kp, ku, ke = jax.random.split(k, 4)
        can_grow = alive & (depth < nsteps)

        # --- parent choice, one per extension lane ---------------------
        if select == "RRT":
            tgt = jax.random.uniform(
                kt, (batch, nx), dtype, data.x_lb, data.x_ub
            )
            use_goal = (
                jax.random.uniform(kp, (batch, 1)) < goal_bias
            )
            tgt = jnp.where(use_goal, data.xf, tgt)
            d2 = jnp.sum(
                (states[None, :, :] - tgt[:, None, :]) ** 2, axis=-1
            )
            d2 = jnp.where(can_grow[None, :], d2, jnp.inf)
            parents = jnp.argmin(d2, axis=1)
        else:
            if select == "EST":
                d2 = jnp.sum(
                    (states[None, :, :] - states[:, None, :]) ** 2,
                    axis=-1,
                )
                nbrs = jnp.sum(
                    (d2 <= r_nbr**2) & can_grow[None, :], axis=1
                )
                wt = 1.0 / (1.0 + nbrs.astype(dtype))
            else:  # KPIECE
                cells = jax.vmap(cell_of)(states)
                counts = jnp.zeros((grid * grid,), jnp.int32).at[
                    cells
                ].add(can_grow.astype(jnp.int32))
                wt = 1.0 / (1.0 + counts[cells].astype(dtype))
            logw = jnp.where(can_grow, jnp.log(wt), -jnp.inf)
            parents = jax.random.categorical(
                kt, logw[None, :], axis=1, shape=(batch,)
            )
            # goal bias (OMPL's EST/KPIECE carry one too): some lanes
            # extend from the node closest to the goal
            dg = jnp.sum((states - data.xf) ** 2, axis=-1)
            dg = jnp.where(can_grow, dg, jnp.inf)
            nearest_goal = jnp.argmin(dg)
            use_goal = jax.random.uniform(kp, (batch,)) < goal_bias
            parents = jnp.where(use_goal, nearest_goal, parents)

        # --- constant-control propagation of <= ext_max steps ----------
        u = jax.random.uniform(
            ku, (batch, nu), dtype, data.u_lb, data.u_ub
        )
        elen = jax.random.randint(ke, (batch,), 1, ext_max + 1)
        px = states[parents]
        pd = depth[parents]
        # never extend past the horizon
        elen = jnp.minimum(elen, nsteps - pd)

        def propagate(x0p, d0, e, uc):
            from ..transcribe import obstacles as obs_mod

            def step(c, i):
                x, ok = c
                t = (d0 + i).astype(dtype) * dt
                k1 = dynamics(x, uc, t, data)
                k2 = dynamics(
                    x + 0.5 * dt * k1, uc, t + 0.5 * dt, data
                )
                xn = x + dt * k2
                live = i < e
                xn = jnp.where(live, xn, x)
                # collision at the child's *actual* clock time (tracks
                # move; eOMPL's checker ignores them, eOMPL.cpp:95-111 —
                # we do better)
                g = obs_mod.collision_values(
                    xn[:2], t + dt, data.obstacles, data.tracks
                )
                ok_i = jnp.all(g <= 0.0) & jnp.all(
                    (xn >= data.x_lb) & (xn <= data.x_ub)
                )
                ok = ok & (ok_i | ~live)
                return (xn, ok), None

            (xe, ok), _ = jax.lax.scan(
                step, (x0p, jnp.asarray(True)), jnp.arange(ext_max)
            )
            return xe, ok

        child_x, ok = jax.vmap(propagate)(px, pd, elen, u)
        ok = ok & (elen > 0) & can_grow[parents]
        child_d = pd + elen

        # child control prefix = parent prefix with [pd, pd+e) := u
        idx = jnp.arange(nsteps)

        def child_ctrl(p, d0, e, uc):
            m = ((idx >= d0) & (idx < d0 + e))[:, None]
            return jnp.where(m, uc, ctrl[p])

        cctrl = jax.vmap(child_ctrl)(parents, pd, elen, u)

        # --- append (block write at the current count) ------------------
        count = jnp.sum(alive.astype(jnp.int32))
        start = jnp.minimum(count, M - batch)
        states = jax.lax.dynamic_update_slice(
            states, child_x, (start, 0)
        )
        depth = jax.lax.dynamic_update_slice(depth, child_d, (start,))
        ctrl = jax.lax.dynamic_update_slice(ctrl, cctrl, (start, 0, 0))
        alive = jax.lax.dynamic_update_slice(alive, ok, (start,))
        return (states, depth, ctrl, alive), None

    keys = jax.random.split(key, n_iters)
    (states, depth, ctrl, alive), _ = jax.lax.scan(
        grow, (states0, depth0, ctrl0, alive0), keys
    )

    # --- pick the best node by full padded replay -----------------------
    eval_one = _score_rollout(dynamics, data, dt, goal_weight,
                              effort_weight)
    scores, Xs = jax.vmap(eval_one)(ctrl)
    # prefer deep, valid nodes; dead slots out
    scores = jnp.where(alive, scores, jnp.inf)
    scores = scores + 0.1 * (nsteps - depth).astype(dtype)
    best = jnp.argmin(scores)
    Ub = ctrl[best]
    Xb = Xs[best]
    U_nodes = jnp.concatenate([Ub[:1], Ub], axis=0)
    info = dict(
        scores=scores,
        best=best,
        n_nodes=jnp.sum(alive.astype(jnp.int32)),
        depth=depth,
        best_depth=depth[best],
    )
    return Xb, U_nodes, info
