"""Exact integer support: batched branch-and-bound over the smooth solver.

The reference's MILP backends (eGLPK/eGurobi/eSCIP) get exact integer
variables from their solvers' branch-and-cut (``glp_intopt``,
eGLPK.cpp:66; ``GRBModel::optimize``, eGurobi.cpp:115).  The TPU build's
single smooth solver relaxes integrality; this module restores it the
TPU way (SURVEY.md §7 step 7): a **batched** best-first branch-and-bound
where the open-node frontier — not a single node — is what gets solved
per wave.  Each B&B node is nothing but a per-entry box override on the
decision vector, so a *wave* of W nodes is one ``vmap``-ed relaxation
solve of shape [W, nz]: tree search rides the batch axis, the device
program never retraces.

Exactness caveat, stated honestly: a relaxation bound is only valid if
the relaxation is solved to *global* optimality.  For the reference's
MILP class (linear dynamics, convex cost, box constraints — the
canonical ``mip_2d_ex1`` family without obstacle disjunctions) the
relaxation is convex and the search is exact.  With nonconvex obstacle
constraints active it degrades gracefully into a systematic global
search over integer assignments (still far stronger than rounding).

Vartype declarations come from the problem spec (``VarType.INTEGER`` /
``BINARY`` per state/control, ETOL_Types.hpp:31-35; XML ``vartype``
attribute) via :func:`integer_mask`.
"""
from __future__ import annotations

import dataclasses
import functools
import heapq
import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import VGP, VGPData
from ..core.types import Status, VarType
from ..transcribe.nlp import NLP
from .al_sqp import SolverConfig, _solve_single, init_multipliers


def integer_mask(vgp: VGP) -> np.ndarray:
    """[node_width] bool: which node-variable columns are INTEGER/BINARY.

    The reference applies a variable's vartype at every timestep
    (eGLPK createVars, eGLPK.cpp:103-124); same here: a masked column
    is integral at every node. Param columns (in sorted-name order,
    matching VGP.to_device) carry their own vartype — the reference's
    per-window binaries (eGLPK.cpp:275-332) land here.
    """
    vts = list(vgp.xvartype) + [VarType.CONTINUOUS] * (
        vgp.nx - len(vgp.xvartype)
    )
    vtu = list(vgp.uvartype) + [VarType.CONTINUOUS] * (
        vgp.nu - len(vgp.uvartype)
    )
    vtp = [vgp.params[name].var_type for name in sorted(vgp.params)]
    return np.array(
        [vt != VarType.CONTINUOUS for vt in vts + vtu + vtp], dtype=bool
    )


@dataclasses.dataclass
class MIPResult:
    """Host-side result of a branch-and-bound run."""

    z: np.ndarray            # [nz] best integral solution (or relaxation
                             # if none found)
    obj: float               # its objective (user sign convention)
    status: int              # Status.SOLVED if an integral incumbent was
                             # found and the tree closed; MAX_ITER if the
                             # node budget ran out with an incumbent;
                             # INFEASIBLE if no integral point was found
    best_bound: float        # global relaxation bound at termination
    gap: float               # |obj - best_bound| / max(1, |obj|)
    nodes_solved: int
    waves: int
    incumbent_found: bool


@functools.partial(jax.jit, static_argnums=(0, 1))
def _solve_wave(nlp: NLP, cfg: SolverConfig, data: VGPData, boxes, z0s):
    """Solve one frontier wave: boxes ([W,K,w] lo, [W,K,w] hi) against a
    single shared problem ``data``; returns the stacked SolveResult."""
    lam0 = init_multipliers(nlp, data)

    def one(box_lo, box_hi, z0):
        return _solve_single(
            nlp, cfg, data, z0, lam0, None, (box_lo, box_hi)
        )

    return jax.vmap(one)(boxes[0], boxes[1], z0s)


def _node_key(lo: np.ndarray, hi: np.ndarray) -> bytes:
    return lo.tobytes() + hi.tobytes()


def solve_milp(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    int_cols: np.ndarray,
    *,
    wave: int = 16,
    max_nodes: int = 256,
    int_tol: float = 1e-3,
    gap_tol: float = 1e-4,
    convex_relaxation: Optional[bool] = None,
    verbose: bool = False,
) -> MIPResult:
    """Best-first branch-and-bound. ``int_cols`` is the [nx+nu] bool
    column mask from :func:`integer_mask`.

    Host orchestrates the tree (heap of open nodes keyed by parent
    bound); the device solves ``wave`` relaxations at a time through one
    jitted program.  Children tighten one entry's box to ``<= floor`` /
    ``>= ceil`` of the most fractional relaxed value (classic spatial
    branching); an additional *dive* lane rounds-and-fixes the entire
    integer set of the best open node to reach incumbents early.

    ``convex_relaxation`` gates bound-based pruning: a node's relaxation
    value is a valid lower bound ONLY when the relaxation is solved to
    global optimality, which the smooth AL-SQP guarantees only for
    convex relaxations. When False (or None and the problem carries any
    nonconvex structure — obstacle exclusion zones or user path
    inequalities), nodes are NEVER discarded by bound comparison; the
    relaxation value still drives best-first ordering, and the search
    terminates by exhausting the (finite) branching tree or the node
    budget. The reported ``gap`` is meaningful only in the convex case.
    Cf. the reference's exact-by-construction branch-and-cut
    (glp_intopt, eGLPK.cpp:66) — exactness there also rests on LP
    relaxations being globally solved.
    """
    d = nlp.dims
    K, w = d.nodes, d.node_width
    dtype = np.float32 if data.x0.dtype == jnp.float32 else np.float64
    int_cols = np.asarray(int_cols, dtype=bool)
    cols = np.where(int_cols)[0]
    if cols.size == 0:
        raise ValueError("no INTEGER/BINARY columns; use al_sqp.solve")

    if convex_relaxation is None:
        # conservative default: only box-bounded problems with no
        # obstacle disjunctions and no user inequality callbacks can be
        # presumed convex (dynamics nonconvexity is the user's call —
        # pass convex_relaxation=True explicitly for e.g. linear
        # dynamics with convex cost, the reference MILP class)
        convex_relaxation = not nlp.use_obstacles and not nlp.path_ineq

    sign = -1.0 if nlp.maximize else 1.0
    BIG = np.asarray(np.finfo(dtype).max / 4, dtype)
    root_lo = np.full((K, w), -BIG, dtype)
    root_hi = np.full((K, w), +BIG, dtype)

    # integrality is only decidable for entries the box can still move;
    # entries pinned by the NLP bounds (x0 clamp) are exempt
    lbN, ubN = jax.jit(nlp.bounds, static_argnums=())(data)
    lbN = np.asarray(lbN).reshape(K, w)
    ubN = np.asarray(ubN).reshape(K, w)
    pinned = (ubN - lbN) <= 1e-12

    # guess reused for every node (warm z0 per node would be better; the
    # straight-line guess keeps the wave program trivially shared)
    z_guess = np.asarray(jax.jit(nlp.initial_guess)(data))

    # (bound, tiebreak, lo, hi) heap; root bound = -inf (unknown)
    tie = itertools.count()
    heap = [(-np.inf, next(tie), root_lo, root_hi)]
    seen = {_node_key(root_lo, root_hi)}
    incumbent_z: Optional[np.ndarray] = None
    incumbent_obj = np.inf  # in minimization convention (sign * score)
    nodes_solved = 0
    waves = 0
    feas_tol = 10.0 * cfg.tol_cons

    def frac_parts(Z):
        """[K, w] distance to nearest integer on integer columns."""
        fr = np.abs(Z - np.round(Z))
        out = np.zeros_like(Z)
        out[:, cols] = fr[:, cols]
        out[pinned] = 0.0
        return out

    while heap and nodes_solved < max_nodes:
        # ---- assemble a wave: best `wave` open nodes (+ a dive) -------
        batch = []
        while heap and len(batch) < wave:
            bound, _, lo, hi = heapq.heappop(heap)
            if convex_relaxation and bound >= incumbent_obj - gap_tol:
                continue  # pruned by a valid relaxation bound
            batch.append((bound, lo, hi))
        if not batch:
            break
        # dive lane: round-and-fix the integer set of the best node's
        # box midpoint(clipped guess) to hunt for an incumbent
        if incumbent_z is None and len(batch) < wave:
            lo0, hi0 = batch[0][1], batch[0][2]
            zc = np.clip(
                z_guess.reshape(K, w),
                np.maximum(lo0, lbN),
                np.minimum(hi0, ubN),
            )
            r = np.round(zc)
            dlo, dhi = lo0.copy(), hi0.copy()
            dlo[:, cols] = np.where(
                pinned[:, cols], dlo[:, cols], r[:, cols]
            )
            dhi[:, cols] = np.where(
                pinned[:, cols], dhi[:, cols], r[:, cols]
            )
            batch.append((-np.inf, dlo, dhi))

        W = len(batch)
        pad = wave - W
        los = np.stack([b[1] for b in batch] + [root_lo] * pad)
        his = np.stack([b[2] for b in batch] + [root_hi] * pad)
        z0s = np.broadcast_to(z_guess, (wave, z_guess.size)).copy()
        res = _solve_wave(
            nlp, cfg, data, (jnp.asarray(los), jnp.asarray(his)),
            jnp.asarray(z0s),
        )
        zs = np.asarray(res.z)
        objs = np.asarray(res.obj)
        viol = np.maximum(np.asarray(res.viol_eq), np.asarray(res.viol_in))
        stat = np.asarray(res.status)
        waves += 1
        nodes_solved += W

        for i in range(W):
            node_bound = batch[i][0]
            if stat[i] == int(Status.DIVERGED) or not np.isfinite(objs[i]):
                continue  # node failed numerically: drop (incomplete
                # tree → reported via gap at termination)
            if viol[i] > feas_tol:
                continue  # relaxation infeasible → prune subtree
            relax_obj = sign * float(objs[i])
            # valid lower bound only if the relaxation is globally
            # solved (convex case); still used for best-first ordering.
            # Nonconvex: a worse-than-incumbent LOCAL optimum proves
            # nothing about the subtree — keep branching.
            if convex_relaxation and relax_obj >= incumbent_obj - gap_tol:
                continue
            Z = zs[i].reshape(K, w)
            fr = frac_parts(Z)
            if fr.max() <= int_tol:
                # integral & feasible → incumbent
                if relax_obj < incumbent_obj:
                    incumbent_obj = relax_obj
                    incumbent_z = zs[i].copy()
                    if verbose:
                        print(
                            f"[bb] incumbent {sign * incumbent_obj:.6g}"
                            f" after {nodes_solved} nodes"
                        )
                continue
            # branch on the most fractional entry
            t, j = np.unravel_index(np.argmax(fr), fr.shape)
            v = Z[t, j]
            lo, hi = batch[i][1], batch[i][2]
            for child_lo, child_hi in (
                (lo, np.minimum(hi, _set(hi, t, j, np.floor(v)))),
                (np.maximum(lo, _set(lo, t, j, np.ceil(v))), hi),
            ):
                eff_lo = np.maximum(child_lo[t, j], lbN[t, j])
                eff_hi = np.minimum(child_hi[t, j], ubN[t, j])
                if eff_lo > eff_hi + 1e-9:
                    continue  # empty child
                key = _node_key(child_lo, child_hi)
                if key in seen:
                    continue
                seen.add(key)
                heapq.heappush(
                    heap, (relax_obj, next(tie), child_lo, child_hi)
                )

    best_bound = min(
        [b for b, *_ in heap] + [incumbent_obj]
    ) if heap else incumbent_obj
    if incumbent_z is None:
        return MIPResult(
            z=np.zeros(d.nz, dtype),
            obj=np.nan,
            status=int(Status.INFEASIBLE),
            best_bound=sign * best_bound if np.isfinite(best_bound)
            else np.nan,
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
        # local relaxation values bound nothing: report the gap as
        # unknown; "closed" = the branching tree was exhausted
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


def _set(a: np.ndarray, t: int, j: int, v: float) -> np.ndarray:
    out = a.copy()
    out[t, j] = v
    return out
