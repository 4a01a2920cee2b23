"""Named sampling-based planners — eOMPL's planner registry, TPU-style.

The reference's eOMPL backend selects a kinodynamic planner by name
{RRT, SST, EST, KPIECE, PDST} (eOMPL.cpp:121-159) and grows ONE tree,
one propagation at a time, with a ray-cast validity checker.  A TPU
re-think keeps each planner's *defining mechanism* but replaces serial
tree growth with ONE fixed-shape batched tree program (``batch``
extensions per compiled step):

========  =============================================================
name      selection / pruning mechanism here (all on the same tree)
========  =============================================================
RRT       Voronoi bias: parent = nearest node to a random target state
EST       low-density bias: parent ~ 1 / (1 + #neighbors in a ball)
KPIECE    coverage bias: parent ~ 1 / (1 + its (x, y)-cell count)
SST       BestNear selection (cheapest cost-from-root node within a
          radius of the random target) + **witness pruning**: each
          coverage cell is a quantized witness keeping only its
          locally-cheapest node; dominated nodes are deactivated and
          never extended — the sparse, asymptotically-near-optimal
          mechanism of Li/Littlefield/Bekris SST
PDST      **deterministic subdivision priorities**: every nonempty
          cell carries a priority (init 1); each step extends from the
          lowest-priority cells and DOUBLES their priority — dense
          regions are revisited geometrically less often, yet every
          region is revisited infinitely often (Ladd–Kavraki PDST's
          selection rule, on the fixed grid as the subdivision)
========  =============================================================

Two extra names outside the OMPL registry: ``CEM`` (cross-entropy
refinement over whole control sequences) and ``SHOOTING``
(:func:`etol_tpu.solve.shooting.plan`, pure batched random shooting) —
often the best NLP seeds, kept under their honest names.

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
import numpy as np

from ..core.problem import VGPData
from . import shooting

PLANNERS = ("RRT", "SST", "EST", "KPIECE", "PDST")
EXTRA_PLANNERS = ("CEM", "SHOOTING")

# extensions-per-second rate used to map the reference's wall-clock
# solve budget onto a tree/sample capacity (see budget_samples); a
# deliberately conservative figure — one compiled batched tree step
# retires `batch` extensions, and even the CPU backend clears several
# thousand extensions per second on the test problems
EXT_RATE = 2048.0


def budget_samples(
    solve_time: float, ext_rate: float = EXT_RATE,
    lo: int = 64, hi: int = 65536,
) -> int:
    """Map a wall-clock solve budget (seconds) to a tree/sample capacity.

    The reference budgets its planner by wall-clock — ``solveTime_ =
    nSteps * dt`` seconds (eOMPL.cpp:241) consumed by
    ``ss_->solve(solveTime_)`` (eOMPL.cpp:164). A traced fixed-shape
    tree cannot branch on a clock, so the budget maps DETERMINISTICALLY
    onto the number of extensions the planner is allowed
    (``solve_time * ext_rate``, clamped) — the same dial with
    reproducible results: a shorter budget grows a smaller tree and
    yields the planner's "approximate solution" outcome (MAX_ITER)."""
    return int(np.clip(round(solve_time * ext_rate), lo, hi))


def plan(
    name: str,
    dynamics: Callable,
    nsteps: int,
    data: VGPData,
    n_samples: Optional[int] = 1024,
    key: Optional[jax.Array] = None,
    solve_time: Optional[float] = None,
    ext_rate: float = EXT_RATE,
    **kw,
):
    """Dispatch by planner name (case-insensitive), eOMPL setPlanner
    parity (eOMPL.cpp:121-159); the two extra non-OMPL names are
    documented in the module header.

    ``solve_time`` (seconds) is the reference's solve-budget dial
    (eOMPL.cpp:161-173,241): when given it overrides ``n_samples`` via
    :func:`budget_samples`."""
    name = name.strip().upper()
    if solve_time is not None:
        n_samples = budget_samples(solve_time, ext_rate)
    elif n_samples is None:
        n_samples = 1024
    if key is None:
        key = jax.random.PRNGKey(0)
    if name == "SHOOTING":
        return shooting.plan(dynamics, nsteps, data, n_samples, key, **kw)
    if name == "CEM":
        return _plan_cem(dynamics, nsteps, data, n_samples, key, **kw)
    if name in PLANNERS:
        return _plan_tree(
            dynamics, nsteps, data, n_samples, key, select=name, **kw
        )
    raise ValueError(
        f"unknown planner {name!r}; choose from "
        f"{PLANNERS + EXTRA_PLANNERS}"
    )


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
# CEM: cross-entropy refinement over control sequences (extra planner)
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
    control sequences to the elite set. Not an OMPL planner — kept
    under its own name because it is often the strongest NLP seed."""
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
# batched kinodynamic tree (RRT / EST / KPIECE / SST / PDST policies)
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
    propagation, eOMPL's ODEBasicSolver analog).  ``select`` picks the
    planner's defining selection/pruning mechanism:

    * RRT    — Voronoi bias: parent = nearest node to a random target
    * EST    — low-density bias: parent ~ 1 / (1 + #neighbors)
    * KPIECE — coverage bias: parent ~ 1 / (1 + its (x,y)-cell count)
    * SST    — BestNear: parent = cheapest (cost-from-root) node within
      a selection radius of the random target, nearest as fallback;
      plus witness pruning — each coverage cell keeps only its cheapest
      node, dominated nodes are deactivated (never extended again), the
      defining sparse/near-optimal mechanism of SST
    * PDST   — deterministic subdivision priorities: extend from the
      lowest-priority nonempty cells and double their priority (the
      Ladd–Kavraki selection schedule on the fixed grid; dense regions
      revisit geometrically less often, every region infinitely often)

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
    G2 = grid * grid

    # node storage
    states0 = jnp.zeros((M, nx), dtype).at[0].set(data.x0)
    depth0 = jnp.zeros((M,), jnp.int32)
    ctrl0 = jnp.zeros((M, nsteps, nu), dtype)
    alive0 = jnp.zeros((M,), bool).at[0].set(True)
    cost0 = jnp.zeros((M,), dtype)
    # SST witness grid: per-cell cheapest cost + its node ("champion")
    wit_cost0 = jnp.full((G2,), jnp.inf, dtype)
    wit_node0 = jnp.full((G2,), -1, jnp.int32)
    # PDST subdivision priorities (deterministic, init 1)
    prio0 = jnp.ones((G2,), dtype)
    pruned0 = jnp.zeros((), jnp.int32)

    span = data.x_ub - data.x_lb
    # density/coverage radius ~ a couple of grid cells
    r_nbr = 0.1 * jnp.sqrt(jnp.sum(span * span))
    # SST BestNear selection radius (delta_BN); the witness radius
    # delta_s is the grid cell size by quantization
    r_bn = 0.15 * jnp.sqrt(jnp.sum(span * span))

    def cell_of(x):
        f = jnp.clip((x[:2] - data.x_lb[:2]) / span[:2], 0.0, 1.0 - 1e-6)
        ij = (f * grid).astype(jnp.int32)
        return ij[0] * grid + ij[1]

    def grow(carry, k):
        (states, depth, ctrl, alive, cost, wit_cost, wit_node, prio,
         pruned, n_written) = carry
        kt, kp, ku, ke = jax.random.split(k, 4)
        can_grow = alive & (depth < nsteps)

        # --- parent choice, one per extension lane ---------------------
        if select in ("RRT", "SST"):
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
            if select == "SST":
                # BestNear: cheapest node within delta_BN of the
                # target; nearest node when the ball is empty
                near = d2 <= r_bn**2
                cnear = jnp.where(near, cost[None, :], jnp.inf)
                best_near = jnp.argmin(cnear, axis=1)
                has_near = jnp.any(near, axis=1)
                parents = jnp.where(
                    has_near, best_near, jnp.argmin(d2, axis=1)
                )
            else:
                parents = jnp.argmin(d2, axis=1)
        elif select == "PDST":
            # deterministic: the `batch` lowest-priority nonempty cells
            cells = jax.vmap(cell_of)(states)
            counts = jnp.zeros((G2,), jnp.int32).at[cells].add(
                can_grow.astype(jnp.int32)
            )
            prio_eff = jnp.where(counts > 0, prio, jnp.inf)
            neg_p, cell_pick = jax.lax.top_k(-prio_eff, batch)
            lane_ok = jnp.isfinite(neg_p)
            # parent = uniform random alive node inside the lane's cell
            in_cell = can_grow[None, :] & (
                cells[None, :] == cell_pick[:, None]
            )
            logw = jnp.where(in_cell, 0.0, -jnp.inf)
            cat = jax.random.categorical(kt, logw, axis=1)
            dg = jnp.sum((states - data.xf) ** 2, axis=-1)
            dg = jnp.where(can_grow, dg, jnp.inf)
            nearest_goal = jnp.argmin(dg)
            use_goal = jax.random.uniform(kp, (batch,)) < goal_bias
            parents = jnp.where(
                use_goal | ~lane_ok, nearest_goal, cat
            )
            # the PDST schedule: selected cells cost double next time
            prio = prio.at[
                jnp.where(lane_ok & ~use_goal, cell_pick, G2)
            ].multiply(2.0, mode="drop")
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
                counts = jnp.zeros((G2,), jnp.int32).at[
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
        # cost-from-root: time + control effort of the new segment
        seg = elen.astype(dtype) * dt * (
            1.0 + effort_weight * jnp.sum(u * u, axis=-1)
        )
        child_c = cost[parents] + seg

        # child control prefix = parent prefix with [pd, pd+e) := u
        idx = jnp.arange(nsteps)

        def child_ctrl(p, d0, e, uc):
            m = ((idx >= d0) & (idx < d0 + e))[:, None]
            return jnp.where(m, uc, ctrl[p])

        cctrl = jax.vmap(child_ctrl)(parents, pd, elen, u)

        # --- append (block write at the monotone write cursor; NOT at
        # the live count — pruning shrinks the live count, and writing
        # there would overwrite live nodes' slots) ----------------------
        start = jnp.minimum(n_written, M - batch)
        n_written = jnp.minimum(n_written + batch, M)
        child_idx = start + jnp.arange(batch, dtype=jnp.int32)

        if select == "SST":
            # witness pruning: a child survives only if it is the
            # cheapest its cell has ever seen; the cell's previous
            # champion is deactivated (kept in storage for paths, never
            # extended — SST's "inactive" set)
            ccell = jax.vmap(cell_of)(child_x)
            c_eff = jnp.where(ok, child_c, jnp.inf)
            old_best = wit_cost[ccell]
            wit_cost = wit_cost.at[ccell].min(c_eff)
            accepted = ok & (c_eff <= wit_cost[ccell]) & (
                c_eff < old_best
            )
            old_champ = wit_node[ccell]
            deact = jnp.where(
                accepted & (old_champ >= 0), old_champ, M
            )
            pruned = pruned + jnp.sum(
                (deact < M) & alive[jnp.minimum(deact, M - 1)]
            ).astype(jnp.int32)
            alive = alive.at[deact].set(False, mode="drop")
            wit_node = wit_node.at[
                jnp.where(accepted, ccell, G2)
            ].set(child_idx, mode="drop")
            ok = accepted

        states = jax.lax.dynamic_update_slice(
            states, child_x, (start, 0)
        )
        depth = jax.lax.dynamic_update_slice(depth, child_d, (start,))
        ctrl = jax.lax.dynamic_update_slice(ctrl, cctrl, (start, 0, 0))
        cost = jax.lax.dynamic_update_slice(cost, child_c, (start,))
        alive = jax.lax.dynamic_update_slice(alive, ok, (start,))
        return (states, depth, ctrl, alive, cost, wit_cost, wit_node,
                prio, pruned, n_written), None

    keys = jax.random.split(key, n_iters)
    (states, depth, ctrl, alive, cost, wit_cost, wit_node, prio,
     pruned, _nw), _ = jax.lax.scan(
        grow,
        (states0, depth0, ctrl0, alive0, cost0, wit_cost0, wit_node0,
         prio0, pruned0, jnp.asarray(1, jnp.int32)),
        keys,
    )

    # --- pick the best node by full padded replay -----------------------
    eval_one = _score_rollout(dynamics, data, dt, goal_weight,
                              effort_weight)
    scores, Xs = jax.vmap(eval_one)(ctrl)
    # prefer deep, valid nodes; dead slots out (SST: witness champions
    # remain selectable — dominated nodes were deactivated)
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
        cost=cost,
        n_pruned=pruned,
        cell_priority=prio,
        witness_cost=wit_cost,
    )
    return Xb, U_nodes, info
