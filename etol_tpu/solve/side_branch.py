"""Exact obstacle avoidance by disjunctive side branching.

The reference's MILP backends encode "stay out of each convex obstacle
piece" with one binary per piece side and big-M rows: at least one side's
halfplane must hold at every timestep (addObstacleSides/addObstacleSum,
eGLPK.cpp:190-246; the example disjunctions,
etol_glpk_example1.cpp:160-194, and the NSIDES=4 polygonal approximation
of moving circles, :196-276). GLPK's branch-and-cut then resolves the
disjunctions exactly — which is why the reference finds the true optimum
12 on ``mip_2d_ex1`` where a smooth conservative reformulation (softmin
containment + edge-ellipse bands, transcribe/obstacles.py) lands at ~14:
the smoothing inflates the obstacles and closes the optimal corridor.

This module restores exactness the TPU way: **branch on the escape
side**. A relaxation node is a per-(timestep, piece) (and per-(timestep,
track)) side assignment:

* ``-1`` — the disjunction is DROPPED for that node pair (a valid
  relaxation: removing constraints can only enlarge the feasible set);
* ``m >= 0`` — halfspace row ``m`` of the piece (or square side ``m``
  of the track) is enforced as a single LINEAR constraint
  ``n_m . p >= b_m``.

With every violated pair branched, the union of a pair's children
(one per real side) covers exactly "outside the piece at that node" —
the reference's Σb ≤ n−0.5 disjunction — so the search is exact. For the
reference MILP class (linear dynamics, convex cost, linear user rows)
every relaxation is CONVEX, its AL-SQP solution is a global optimum, and
relaxation values are valid lower bounds: best-first search with bound
pruning terminates with the true optimum (cf. solve/branch_bound.py for
the integer-variable analog and the same exactness caveat).

Side assignments ride as DATA (``SideData`` pytree) — one compiled
relaxation program serves every branch-and-bound node, and a frontier
wave of W nodes is a single vmapped solve of shape [W, nz].

Moving obstacles use the reference's 4-sided square approximation: the
axis-aligned square of half-width r CONTAINS the protected disk, so
excluding it is (slightly conservatively) safe, exactly like the big-M
rows the reference writes at +-r around the interpolated center
(etol_glpk_example1.cpp:196-276).
"""
from __future__ import annotations

import dataclasses
import functools
import heapq
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import VGPData
from ..core.trajectory import linear_interpolation
from ..core.types import Status
from ..transcribe.nlp import NLP
from .al_sqp import SolverConfig, _solve_single, init_multipliers
from .branch_bound import MIPResult


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SideData:
    """A :class:`VGPData` plus per-(node, piece/track) side assignments.

    Attribute access forwards to ``base`` so the NLP machinery (bounds,
    costs, dynamics) reads it like a plain VGPData.
    """

    base: VGPData
    sel_piece: jax.Array   # [K, P] int32: -1 drop, m = halfspace row
    sel_track: jax.Array   # [K, T] int32: -1 drop, m = square side

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "base"), name)


# square-side normals for the moving-obstacle approximation (the
# reference's NSIDES=4, etol_glpk_example1.cpp:28-29): +x, -x, +y, -y
_TRACK_SIDES = 4


def _side_constraints(x, u, t, data):
    """Side-assigned linear avoidance rows, <= 0 feasible.

    Replaces the smooth obstacle stack when branching: for each piece
    with an assigned side m, require n_m . p >= b_m (outside through
    side m); for each track, require the chosen axis distance >= r.
    Dropped pairs report -1 (feasible)."""
    k = jnp.round(t / data.dt).astype(jnp.int32)
    p = x[:2]
    obs = data.obstacles
    hs = obs.halfspaces  # [P, H, 3]
    margins = hs[..., 2] - (hs[..., 0] * p[0] + hs[..., 1] * p[1])
    selp = data.sel_piece[k]  # [P]
    chosen = jnp.take_along_axis(
        margins, jnp.clip(selp, 0, hs.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    gp = jnp.where((selp >= 0) & (obs.piece_mask > 0), chosen, -1.0)

    trk = data.tracks
    T = trk.xy.shape[0]
    cs = jnp.stack(
        [
            linear_interpolation(t, trk.times[i], trk.xy[i])
            for i in range(T)
        ]
    )  # [T, D]
    d = p[None, :] - cs[:, :2]
    sides = jnp.stack([d[:, 0], -d[:, 0], d[:, 1], -d[:, 1]], axis=1)
    selt = data.sel_track[k]  # [T]
    chosen_t = jnp.take_along_axis(
        sides, jnp.clip(selt, 0, _TRACK_SIDES - 1)[:, None], axis=1
    )[:, 0]
    gt = jnp.where(
        (selt >= 0) & (trk.mask > 0), trk.radius - chosen_t, -1.0
    )
    return jnp.concatenate([gp, gt])


def branch_nlp(nlp: NLP) -> NLP:
    """The relaxation NLP: obstacles off, side rows on."""
    return dataclasses.replace(
        nlp,
        use_obstacles=False,
        path_ineq=nlp.path_ineq + (_side_constraints,),
    )


def _violations(Z2, hs, hs_mask, piece_mask, centers, radius, tmask,
                selp, selt, eps):
    """Host-side: deepest disjunction violation per lane.

    Returns (kind, k, j, depth): kind 0 = none, 1 = piece, 2 = track.
    A pair already carrying a side assignment is enforced by the solver,
    so only ``sel == -1`` pairs can violate."""
    K = Z2.shape[0]
    # piece containment depth: min over real halfspace margins (>0 deep
    # inside); [K, P]
    marg = hs[None, :, :, 2] - (
        hs[None, :, :, 0] * Z2[:, None, None, 0]
        + hs[None, :, :, 1] * Z2[:, None, None, 1]
    )
    marg = np.where(hs_mask[None] > 0, marg, np.inf)
    depth_p = marg.min(axis=2)  # [K, P]
    depth_p = np.where(
        (piece_mask[None] > 0) & (selp < 0), depth_p, -np.inf
    )
    # track square containment depth: r - max(|dx|, |dy|) (>0 inside)
    d = np.abs(Z2[:, None, :2] - centers[:, :, :2])  # [K, T, 2]
    depth_t = radius[None, :] - d.max(axis=2)
    depth_t = np.where(
        (tmask[None] > 0) & (selt < 0), depth_t, -np.inf
    )
    bp = np.unravel_index(np.argmax(depth_p), depth_p.shape)
    bt = np.unravel_index(np.argmax(depth_t), depth_t.shape)
    vp, vt = depth_p[bp], depth_t[bt]
    if max(vp, vt) <= eps:
        return (0, 0, 0, 0.0)
    if vp >= vt:
        return (1, int(bp[0]), int(bp[1]), float(vp))
    return (2, int(bt[0]), int(bt[1]), float(vt))


def solve_exact(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    *,
    wave: int = 16,
    max_nodes: int = 512,
    gap_tol: float = 1e-3,
    inside_eps: float = 1e-3,
    convex_relaxation: bool = True,
    verbose: bool = False,
) -> MIPResult:
    """Branch-and-bound over obstacle escape sides (exact big-M parity).

    ``nlp`` is the problem's ordinary NLP (its smooth obstacle stack is
    replaced by the side machinery); ``data`` a single (unbatched)
    VGPData. ``convex_relaxation=True`` (valid for the reference MILP
    class: linear dynamics + convex cost + linear user rows) enables
    bound pruning and a true optimality gap.
    """
    d = nlp.dims
    K = d.nodes
    bnlp = branch_nlp(nlp)
    lam0 = init_multipliers(
        bnlp,
        SideData(
            data,
            jnp.full((K, data.obstacles.halfspaces.shape[0]), -1,
                     jnp.int32),
            jnp.full((K, data.tracks.xy.shape[0]), -1, jnp.int32),
        ),
    )
    P = data.obstacles.halfspaces.shape[0]
    T = data.tracks.xy.shape[0]
    hs = np.asarray(data.obstacles.halfspaces)
    hs_mask = np.asarray(data.obstacles.hs_mask)
    piece_mask = np.asarray(data.obstacles.piece_mask)
    tmask = np.asarray(data.tracks.mask)
    radius = np.asarray(data.tracks.radius)
    n_sides = hs_mask.sum(axis=1).astype(int)  # real rows per piece
    # track centers at node times (for violation detection)
    ts = np.arange(K) * float(np.asarray(data.dt))
    centers = np.stack(
        [
            np.stack(
                [
                    np.asarray(
                        linear_interpolation(
                            jnp.asarray(t, jnp.float32),
                            data.tracks.times[i], data.tracks.xy[i],
                        )
                    )
                    for i in range(T)
                ]
            )
            for t in ts
        ]
    )  # [K, T, D]

    sign = -1.0 if nlp.maximize else 1.0
    z_guess = np.asarray(jax.jit(nlp.initial_guess)(data))
    feas_tol = 10.0 * cfg.tol_cons

    def solve_wave(batch):
        W = len(batch)
        pad = wave - W
        selp = np.stack(
            [b[1] for b in batch] + [batch[0][1]] * pad
        ).astype(np.int32)
        selt = np.stack(
            [b[2] for b in batch] + [batch[0][2]] * pad
        ).astype(np.int32)
        z0s = np.stack(
            [b[3] for b in batch] + [batch[0][3]] * pad
        )
        sdata = SideData(
            jax.tree.map(
                lambda a: jnp.broadcast_to(a, (wave,) + a.shape), data
            ),
            jnp.asarray(selp),
            jnp.asarray(selt),
        )
        res = _wave_jit(bnlp, cfg, sdata, jnp.asarray(z0s), lam0)
        return res

    tie = itertools.count()
    root = (
        -np.inf,
        np.full((K, P), -1, np.int8),
        np.full((K, T), -1, np.int8),
        z_guess,
    )
    heap = [(-np.inf, next(tie), root)]
    seen = {root[1].tobytes() + root[2].tobytes()}
    incumbent_z = None
    incumbent_obj = np.inf
    nodes_solved = 0
    waves = 0

    while heap and nodes_solved < max_nodes:
        batch = []
        while heap and len(batch) < wave:
            bound, _, node = heapq.heappop(heap)
            if convex_relaxation and bound >= incumbent_obj - gap_tol:
                continue
            batch.append(node)
        if not batch:
            break
        res = solve_wave(batch)
        zs = np.asarray(res.z)
        objs = np.asarray(res.obj)
        viol = np.maximum(
            np.asarray(res.viol_eq), np.asarray(res.viol_in)
        )
        stat = np.asarray(res.status)
        waves += 1
        nodes_solved += len(batch)

        for i, (_, selp, selt, _) in enumerate(batch):
            if stat[i] == int(Status.DIVERGED) or not np.isfinite(
                objs[i]
            ):
                continue
            if viol[i] > feas_tol:
                continue  # relaxation infeasible -> prune subtree
            relax_obj = sign * float(objs[i])
            if convex_relaxation and relax_obj >= incumbent_obj - gap_tol:
                continue
            Z2 = zs[i].reshape(K, -1)[:, :2]
            kind, k, j, depth = _violations(
                Z2, hs, hs_mask, piece_mask, centers, radius, tmask,
                selp, selt, inside_eps,
            )
            if kind == 0:
                if relax_obj < incumbent_obj:
                    incumbent_obj = relax_obj
                    incumbent_z = zs[i].copy()
                    if verbose:
                        print(
                            f"[side-bb] incumbent "
                            f"{sign * incumbent_obj:.6g} after "
                            f"{nodes_solved} nodes"
                        )
                continue
            n_children = (
                n_sides[j] if kind == 1 else _TRACK_SIDES
            )
            for m in range(n_children):
                cp, ct = selp.copy(), selt.copy()
                if kind == 1:
                    cp[k, j] = m
                else:
                    ct[k, j] = m
                key = cp.tobytes() + ct.tobytes()
                if key in seen:
                    continue
                seen.add(key)
                heapq.heappush(
                    heap,
                    (relax_obj, next(tie), (relax_obj, cp, ct, zs[i])),
                )

    best_bound = min(
        [b for b, *_ in heap] + [incumbent_obj]
    ) if heap else incumbent_obj
    if incumbent_z is None:
        return MIPResult(
            z=np.zeros(d.nz, np.float32),
            obj=np.nan,
            status=int(Status.INFEASIBLE),
            best_bound=sign * best_bound
            if np.isfinite(best_bound) else np.nan,
            gap=np.inf,
            nodes_solved=nodes_solved,
            waves=waves,
            incumbent_found=False,
        )
    if convex_relaxation:
        gap = abs(incumbent_obj - best_bound) / max(
            1.0, abs(incumbent_obj)
        )
        closed = (not heap) or gap <= gap_tol
    else:
        gap = 0.0 if not heap else float("nan")
        closed = not heap
    return MIPResult(
        z=incumbent_z,
        obj=sign * incumbent_obj,
        status=int(Status.SOLVED) if closed else int(Status.MAX_ITER),
        best_bound=sign * best_bound,
        gap=float(gap),
        nodes_solved=nodes_solved,
        waves=waves,
        incumbent_found=True,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _wave_jit(bnlp: NLP, cfg: SolverConfig, sdata: SideData, z0s, lam0):
    def one(sd, z0):
        return _solve_single(bnlp, cfg, sd, z0, lam0)

    return jax.vmap(one)(sdata, z0s)
