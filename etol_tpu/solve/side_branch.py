"""Exact disjunctions + integers: one unified branch-and-bound.

The reference's MILP backends encode BOTH binary families in one model:
"stay out of each convex obstacle piece" big-M rows (one binary per
piece side, addObstacleSides/addObstacleSum, eGLPK.cpp:190-246; the
example disjunctions, etol_glpk_example1.cpp:160-194, and the NSIDES=4
polygonal approximation of moving circles, :196-276) AND per-window
integer/binary decision variables (param vartypes, eGLPK.cpp:275-332).
``glp_intopt``'s branch-and-cut then resolves the single model exactly,
which is why the reference finds the true optimum 12 on ``mip_2d_ex1``
where a smooth conservative reformulation (softmin containment +
edge-ellipse bands, transcribe/obstacles.py) lands at ~14: the
smoothing inflates the obstacles and closes the optimal corridor.

This module restores that exactness the TPU way with ONE search whose
node is a pair of overrides on the relaxation:

* a per-(timestep, piece/track) **side assignment** — ``-1`` means the
  disjunction is DROPPED for that pair (a valid relaxation: removing
  constraints only enlarges the feasible set); ``m >= 0`` enforces
  halfspace row ``m`` of the piece (or square side ``m`` of the track)
  as a single LINEAR row ``n_m . p >= b_m``;
* a per-(timestep, column) **box override** — the classic spatial
  branching ``<= floor`` / ``>= ceil`` split on INTEGER/BINARY columns
  (cf. solve/branch_bound.py, the integer-only engine this composes
  with).

With every violated pair branched the union of a pair's children covers
exactly "outside the piece at that node" (the reference's Σb ≤ n−0.5
disjunction), and with every fractional integer column branched the box
tree covers the integer lattice — so the combined search is exact. For
the reference MILP class (linear dynamics, convex cost, linear user
rows) every relaxation is CONVEX, its converged AL-SQP solution is a
global optimum, and relaxation values are valid lower bounds:
best-first search with bound pruning terminates at the true optimum.

Soundness of pruning (advisor r3): a node is discarded ONLY with a
certificate —

* ``SOLVED`` (converged, feasible): its value prunes by bound;
* **stagnation**: a node that exhausted its budget with violation that
  a warm full-budget retry failed to halve is pruned as infeasible in
  the convex case (AL with growing rho drives the violation of any
  feasible convex relaxation down; two budgets of stagnation is the
  same epistemic grade as the f32 convergence certificate the bounds
  rest on);
* plain ``MAX_ITER`` (budget exhaustion) is NOT a certificate: the node
  is re-queued warm (carried z, multipliers, penalty) with a fresh
  budget, up to ``max_retries`` times. A node dropped with no
  certificate (divergence, or retries exhausted while still improving)
  flips ``certified=False`` and the final status is downgraded to
  ``MAX_ITER`` — the search never claims a certified optimum over a
  tree it silently truncated.

Side assignments and boxes ride as DATA (``SideData`` pytree + box
arrays) — one compiled relaxation program serves every node of every
tree for a given (wave, Dims), and a frontier wave of W nodes is a
single vmapped solve of shape [W, nz]. Per-node multipliers/penalty are
carried host-side and re-enter the wave as warm starts: children
typically converge in a fraction of the root's iterations.

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
from typing import Optional

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


def _side_constraints(x, u, t, data, _p=None):
    """Side-assigned linear avoidance rows, <= 0 feasible.

    ``_p`` (unused) keeps the param-problem callback ABI: when params
    are declared every user callback receives the trailing param slice
    (transcribe/nlp.py:105-111).

    Replaces the smooth obstacle stack when branching: for each piece
    with an assigned side m, require n_m . pos >= b_m (outside through
    side m); for each track, require the chosen axis distance >= r.
    Dropped pairs report -1 (feasible)."""
    k = jnp.round(t / data.dt).astype(jnp.int32)
    pos = x[:2]
    parts = []
    obs = data.obstacles
    if obs.halfspaces.shape[0] > 0:
        hs = obs.halfspaces  # [P, H, 3]
        margins = hs[..., 2] - (
            hs[..., 0] * pos[0] + hs[..., 1] * pos[1]
        )
        selp = data.sel_piece[k]  # [P]
        chosen = jnp.take_along_axis(
            margins, jnp.clip(selp, 0, hs.shape[1] - 1)[:, None], axis=1
        )[:, 0]
        parts.append(
            jnp.where((selp >= 0) & (obs.piece_mask > 0), chosen, -1.0)
        )

    trk = data.tracks
    T = trk.xy.shape[0]
    if T > 0:
        cs = jnp.stack(
            [
                linear_interpolation(t, trk.times[i], trk.xy[i])
                for i in range(T)
            ]
        )  # [T, D]
        d = pos[None, :] - cs[:, :2]
        sides = jnp.stack([d[:, 0], -d[:, 0], d[:, 1], -d[:, 1]], axis=1)
        selt = data.sel_track[k]  # [T]
        chosen_t = jnp.take_along_axis(
            sides, jnp.clip(selt, 0, _TRACK_SIDES - 1)[:, None], axis=1
        )[:, 0]
        parts.append(
            jnp.where(
                (selt >= 0) & (trk.mask > 0), trk.radius - chosen_t, -1.0
            )
        )
    if not parts:
        return jnp.zeros((0,), x.dtype)
    return jnp.concatenate(parts)


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
    if hs.shape[0] > 0:
        # piece containment depth: min over real halfspace margins (>0
        # deep inside); [K, P]
        marg = hs[None, :, :, 2] - (
            hs[None, :, :, 0] * Z2[:, None, None, 0]
            + hs[None, :, :, 1] * Z2[:, None, None, 1]
        )
        marg = np.where(hs_mask[None] > 0, marg, np.inf)
        depth_p = marg.min(axis=2)  # [K, P]
        depth_p = np.where(
            (piece_mask[None] > 0) & (selp < 0), depth_p, -np.inf
        )
        bp = np.unravel_index(np.argmax(depth_p), depth_p.shape)
        vp = depth_p[bp]
    else:
        bp, vp = (0, 0), -np.inf
    if centers.shape[1] > 0:
        # track square containment depth: r - max(|dx|,|dy|) (>0 inside)
        d = np.abs(Z2[:, None, :2] - centers[:, :, :2])  # [K, T, 2]
        depth_t = radius[None, :] - d.max(axis=2)
        depth_t = np.where(
            (tmask[None] > 0) & (selt < 0), depth_t, -np.inf
        )
        bt = np.unravel_index(np.argmax(depth_t), depth_t.shape)
        vt = depth_t[bt]
    else:
        bt, vt = (0, 0), -np.inf
    if max(vp, vt) <= eps:
        return (0, 0, 0, 0.0)
    if vp >= vt:
        return (1, int(bp[0]), int(bp[1]), float(vp))
    return (2, int(bt[0]), int(bt[1]), float(vt))


@dataclasses.dataclass
class _Node:
    """One open node: relaxation overrides + warm-start payload."""

    bound: float            # valid lower bound inherited/certified
    selp: np.ndarray        # [K, P] int8
    selt: np.ndarray        # [K, T] int8
    lo: np.ndarray          # [K, w] box override (integer branching)
    hi: np.ndarray
    z0: np.ndarray          # [nz] warm start
    lam: tuple              # (lam_def, lam_eq, mu) warm multipliers
    rho: Optional[float]    # warm penalty (None = cfg.rho0)
    retries: int = 0
    prev_viol: float = np.inf
    stagn: int = 0          # consecutive warm retries that failed to
    #                         halve the violation (certificate evidence)


def _next_stagn(stagn: int, stagnant_now: bool) -> int:
    """Consecutive-stagnation counter for the infeasibility
    certificate: a retry that fails to halve the violation extends the
    run; one that improves RESETS it (the certificate's 'two
    consecutive non-halving retries' must mean consecutive — see the
    requeue site in solve_exact)."""
    return (stagn + 1) if stagnant_now else 0


def solve_exact(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    *,
    int_cols: Optional[np.ndarray] = None,
    wave: int = 8,
    max_nodes: int = 512,
    gap_tol: float = 1e-3,
    int_tol: float = 1e-3,
    inside_eps: float = 1e-3,
    convex_relaxation: Optional[bool] = None,
    max_retries: int = 3,
    node_budget: int = 0,
    verbose: bool = False,
) -> MIPResult:
    """Unified branch-and-bound over escape sides AND integer boxes.

    ``nlp`` is the problem's ordinary NLP (its smooth obstacle stack is
    replaced by the side machinery); ``data`` a single (unbatched)
    VGPData; ``int_cols`` the optional [node_width] bool mask from
    :func:`branch_bound.integer_mask` — a VGP with BINARY/INTEGER
    params AND obstacles is solved exactly in this one search (parity:
    one GLPK model holds both binary families,
    etol_glpk_example1.cpp:160-276). ``convex_relaxation=True`` (valid
    for the reference MILP class: linear dynamics + convex cost +
    linear user rows) enables bound pruning and a true optimality gap.
    The default ``None`` auto-detects like :func:`branch_bound.solve_milp`
    (advisor r4): convex iff no user path inequalities — user callbacks
    of unknown curvature disable bound pruning (sound, slower) and a
    caller with LINEAR rows opts in with an explicit ``True``.

    ``node_budget`` caps Newton iterations per node ATTEMPT (0 = the
    cfg's own budget); hard nodes earn more via warm re-queues (up to
    ``max_retries``) instead of every node paying the worst case.
    """
    if convex_relaxation is None:
        # same guard as branch_bound.solve_milp:114 — bound pruning is
        # only sound when every relaxation is convex
        convex_relaxation = not nlp.path_ineq
    d = nlp.dims
    K, w = d.nodes, d.node_width
    bnlp = branch_nlp(nlp)
    if node_budget:
        cfg = dataclasses.replace(cfg, max_total=node_budget)
    P = data.obstacles.halfspaces.shape[0]
    T = data.tracks.xy.shape[0]
    root_sd = SideData(
        data,
        jnp.full((K, P), -1, jnp.int32),
        jnp.full((K, T), -1, jnp.int32),
    )
    lam_cold = jax.tree.map(np.asarray, init_multipliers(bnlp, root_sd))
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
            ) if T else np.zeros((0, 2))
            for t in ts
        ]
    )  # [K, T, D]

    dtype = np.float32 if data.x0.dtype == jnp.float32 else np.float64
    BIG = np.asarray(np.finfo(dtype).max / 4, dtype)
    root_lo = np.full((K, w), -BIG, dtype)
    root_hi = np.full((K, w), +BIG, dtype)
    if int_cols is not None:
        int_cols = np.asarray(int_cols, dtype=bool)
        cols = np.where(int_cols)[0]
    else:
        cols = np.zeros((0,), int)
    # integrality is only decidable for entries the box can still move;
    # entries pinned by the NLP bounds (x0 clamp, window pins) are exempt
    lbN, ubN = jax.jit(bnlp.bounds, static_argnums=())(root_sd)
    lbN = np.asarray(lbN).reshape(K, w)
    ubN = np.asarray(ubN).reshape(K, w)
    pinned = (ubN - lbN) <= 1e-12

    sign = -1.0 if nlp.maximize else 1.0
    z_guess = np.asarray(jax.jit(nlp.initial_guess)(data))
    feas_tol = 10.0 * cfg.tol_cons

    def frac_parts(Z):
        """[K, w] distance to nearest integer on integer columns."""
        if cols.size == 0:
            return np.zeros_like(Z)
        fr = np.abs(Z - np.round(Z))
        out = np.zeros_like(Z)
        out[:, cols] = fr[:, cols]
        out[pinned] = 0.0
        return out

    def solve_wave(batch):
        W = len(batch)
        pad = wave - W

        def stk(get):
            return np.stack([get(n) for n in batch]
                            + [get(batch[0])] * pad)

        sdata = SideData(
            jax.tree.map(
                lambda a: jnp.broadcast_to(a, (wave,) + a.shape), data
            ),
            jnp.asarray(stk(lambda n: n.selp).astype(np.int32)),
            jnp.asarray(stk(lambda n: n.selt).astype(np.int32)),
        )
        lams = tuple(
            jnp.asarray(stk(lambda n, i=i: n.lam[i])) for i in range(3)
        )
        rhos = jnp.asarray(
            np.array(
                [n.rho if n.rho is not None else cfg.rho0
                 for n in batch]
                + [cfg.rho0] * pad, dtype,
            )
        )
        return _wave_jit(
            bnlp, cfg, sdata,
            jnp.asarray(stk(lambda n: n.lo)),
            jnp.asarray(stk(lambda n: n.hi)),
            jnp.asarray(stk(lambda n: n.z0)),
            lams, rhos,
        )

    tie = itertools.count()
    root = _Node(
        bound=-np.inf,
        selp=np.full((K, P), -1, np.int8),
        selt=np.full((K, T), -1, np.int8),
        lo=root_lo, hi=root_hi,
        z0=z_guess, lam=lam_cold, rho=None,
    )
    heap = [(-np.inf, next(tie), root)]

    def key_of(n):
        return (n.selp.tobytes() + n.selt.tobytes()
                + n.lo.tobytes() + n.hi.tobytes())

    seen = {key_of(root)}
    incumbent_z = None
    incumbent_obj = np.inf
    nodes_solved = 0
    waves = 0
    certified = True

    def requeue(node, **updates):
        nn = dataclasses.replace(node, **updates)
        heapq.heappush(heap, (nn.bound, next(tie), nn))

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

        for i, node in enumerate(batch):
            st, v = int(stat[i]), float(viol[i])
            lam_i = (
                np.asarray(res.lam_def[i]),
                np.asarray(res.lam_eq[i]),
                np.asarray(res.mu[i]),
            )
            if st == int(Status.DIVERGED) or not np.isfinite(objs[i]):
                if node.retries < max_retries:
                    # cold restart: divergence poisons the warm state
                    requeue(node, z0=z_guess, lam=lam_cold, rho=None,
                            retries=node.retries + 1,
                            prev_viol=np.inf, stagn=0)
                else:
                    certified = False
                continue
            solved = st == int(Status.SOLVED)
            if not solved:
                # MAX_ITER: budget exhaustion is NOT a certificate.
                stagnant_now = v >= 0.5 * node.prev_viol
                if node.retries < max_retries:
                    requeue(
                        node, z0=zs[i].copy(), lam=lam_i,
                        rho=float(np.asarray(res.rho[i])),
                        retries=node.retries + 1, prev_viol=v,
                        # an improving retry resets the count (else a
                        # converging node whose early retries stagnated
                        # could be pruned as certified-infeasible)
                        stagn=_next_stagn(node.stagn, stagnant_now),
                    )
                    continue
                if v > feas_tol:
                    # stagnation certificate (strengthened, advisor r4):
                    # AL with growing rho drives the violation of any
                    # feasible convex relaxation down, so infeasibility
                    # is certified only when the violation is well clear
                    # of the feasibility band (>> feas_tol) AND at least
                    # two consecutive warm full-budget retries failed to
                    # halve it. Slow-but-converging nodes (small or
                    # still-shrinking violation) are dropped WITHOUT a
                    # certificate instead of being mislabelled.
                    if (
                        convex_relaxation and stagnant_now
                        and node.stagn >= 1 and v > 10.0 * feas_tol
                    ):
                        continue
                    certified = False
                    continue
                # feasible but unconverged: its value bounds nothing;
                # branch on with the INHERITED bound — and if there is
                # nothing left to branch, the incumbent path below
                # flips certified=False (the region closes at an
                # unconverged objective, which is a silent truncation)
            elif v > feas_tol:
                continue  # converged infeasible: certified prune
            relax_obj = sign * float(objs[i])
            child_bound = relax_obj if solved else node.bound
            if (
                convex_relaxation and solved
                and relax_obj >= incumbent_obj - gap_tol
            ):
                continue
            Z = zs[i].reshape(K, w)
            kind, k, j, depth = _violations(
                Z[:, :2], hs, hs_mask, piece_mask, centers, radius,
                tmask, node.selp, node.selt, inside_eps,
            )
            fr = frac_parts(Z)
            if kind == 0 and fr.max() <= int_tol:
                # feasible against the EXACT disjunctions + integral:
                # a valid incumbent (any feasible point upper-bounds) —
                # but only a CONVERGED node certifies its region's
                # optimum; an unconverged leaf has no children and no
                # certificate, so the tree is truncated there
                if relax_obj < incumbent_obj:
                    incumbent_obj = relax_obj
                    incumbent_z = zs[i].copy()
                    if verbose:
                        print(
                            f"[side-bb] incumbent "
                            f"{sign * incumbent_obj:.6g} after "
                            f"{nodes_solved} nodes"
                        )
                if not solved:
                    certified = False
                continue
            children = []
            if kind != 0:
                n_children = (
                    n_sides[j] if kind == 1 else _TRACK_SIDES
                )
                for m in range(n_children):
                    cp, ct = node.selp.copy(), node.selt.copy()
                    if kind == 1:
                        cp[k, j] = m
                    else:
                        ct[k, j] = m
                    children.append(dict(selp=cp, selt=ct))
            else:
                # integer branch on the most fractional entry
                t_i, j_i = np.unravel_index(np.argmax(fr), fr.shape)
                val = Z[t_i, j_i]
                for which in ("floor", "ceil"):
                    clo, chi = node.lo.copy(), node.hi.copy()
                    if which == "floor":
                        chi[t_i, j_i] = min(
                            chi[t_i, j_i], np.floor(val)
                        )
                    else:
                        clo[t_i, j_i] = max(clo[t_i, j_i], np.ceil(val))
                    if (
                        max(clo[t_i, j_i], lbN[t_i, j_i])
                        > min(chi[t_i, j_i], ubN[t_i, j_i]) + 1e-9
                    ):
                        continue  # empty child
                    children.append(dict(lo=clo, hi=chi))
                if incumbent_z is None and cols.size:
                    # dive child: round-and-fix EVERY movable integer
                    # entry of this node's relaxation to hunt an early
                    # incumbent (best-first alone reaches integrality
                    # late when many columns are fractional)
                    r = np.round(
                        np.clip(Z, np.maximum(node.lo, lbN),
                                np.minimum(node.hi, ubN))
                    )
                    dlo, dhi = node.lo.copy(), node.hi.copy()
                    free = ~pinned
                    fc = np.zeros_like(free)
                    fc[:, cols] = True
                    sel = free & fc
                    dlo[sel] = np.maximum(dlo[sel], r[sel])
                    dhi[sel] = np.minimum(dhi[sel], r[sel])
                    if np.all(dlo[sel] <= dhi[sel] + 1e-9):
                        children.append(dict(lo=dlo, hi=dhi))
            for ch in children:
                nn = dataclasses.replace(
                    node, bound=child_bound, z0=zs[i].copy(),
                    lam=lam_i, rho=float(np.asarray(res.rho[i])),
                    retries=0, prev_viol=np.inf, stagn=0, **ch,
                )
                key = key_of(nn)
                if key in seen:
                    continue
                seen.add(key)
                heapq.heappush(heap, (child_bound, next(tie), nn))

    best_bound = min(
        [b for b, *_ in heap] + [incumbent_obj]
    ) if heap else incumbent_obj
    if incumbent_z is None:
        # INFEASIBLE is a claim of certified infeasibility: it requires
        # the tree fully exhausted (no open nodes left behind by the
        # max_nodes budget) AND every prune to have carried a
        # certificate. A budget-truncated search reports MAX_ITER
        # (advisor r4 high: open heap nodes are not "dropped", so
        # ``certified`` alone cannot witness exhaustion).
        exhausted = (not heap) and certified
        return MIPResult(
            z=np.zeros(d.nz, dtype),
            obj=np.nan,
            status=int(Status.INFEASIBLE) if exhausted
            else int(Status.MAX_ITER),
            best_bound=sign * best_bound
            if np.isfinite(best_bound) else np.nan,
            gap=np.inf,
            nodes_solved=nodes_solved,
            waves=waves,
            incumbent_found=False,
            certified=certified and not heap,
        )
    if convex_relaxation:
        gap = abs(incumbent_obj - best_bound) / max(
            1.0, abs(incumbent_obj)
        )
        closed = ((not heap) or gap <= gap_tol) and certified
    else:
        gap = 0.0 if (not heap and certified) else float("nan")
        closed = (not heap) and certified
    return MIPResult(
        z=incumbent_z,
        obj=sign * incumbent_obj,
        status=int(Status.SOLVED) if closed else int(Status.MAX_ITER),
        best_bound=sign * best_bound,
        gap=float(gap),
        nodes_solved=nodes_solved,
        waves=waves,
        incumbent_found=True,
        certified=certified,
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _wave_jit(bnlp: NLP, cfg: SolverConfig, sdata: SideData,
              lo, hi, z0s, lams, rhos):
    def one(sd, blo, bhi, z0, ld, le, mu, rho):
        return _solve_single(
            bnlp, cfg, sd, z0, (ld, le, mu), rho, (blo, bhi)
        )

    return jax.vmap(one)(sdata, lo, hi, z0s, *lams, rhos)
