"""Batched augmented-Lagrangian Gauss-Newton SQP.

The single native solver replacing the reference's plugin zoo (SURVEY.md
§2 C4-C9). Design, TPU-first:

* Whole solve is one traced program: fixed-shape `lax.while_loop`s, no
  data-dependent Python control flow, so one `jit` serves every problem
  instance of the same :class:`~etol_tpu.core.types.Dims` and a problem
  batch is a plain `vmap` (the reference solves one VGP per process;
  here thousands per chip).
* Inequalities (obstacles, user path constraints) and equalities
  (collocation defects, user equalities) are handled by a PHR augmented
  Lagrangian — the smooth replacement for the MILP backends' big-M
  binary disjunctions (eGLPK.cpp:190-246); bounds (incl. the x0 clamp,
  eGurobi addX0 parity eGurobi.cpp:278-303, and the goal tolerance band,
  addXf :305-336) are kept *hard* via a projected-Newton inner loop.
* The inner Newton system uses the Gauss-Newton Hessian of the AL, which
  is block-tridiagonal in the node-major layout; it is factored by the
  block Cholesky in :mod:`etol_tpu.solve.btridiag` — O(K w^3) per
  iteration instead of O((Kw)^3).
* Per-problem convergence status rides in the result (the reference
  exits the process on failure, TrajectoryOptimizer.cpp:1812-1817 —
  a batched solver must not).

Warm starting for receding-horizon MPC (the eGurobi changeX0 fast path,
eGurobi.cpp:419-432): pass the shifted previous solution as ``z0`` and the
previous multipliers; the jitted solve re-invokes with zero retrace.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# full-f32 contraction: TPU f32 matmuls default to bf16 passes, which
# corrupts the Gauss-Newton blocks once rho is large
_einsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)
_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)

from ..core.problem import VGPData
from ..core.types import Status
from ..transcribe.nlp import NLP
from . import btridiag


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver knobs (hashable; part of the jit cache key).

    Defaults are tuned for the canonical ETOL problems in f32. The outer
    tolerance pair plays the role of the reference NLP settings
    (IPOPT nlp_tolerance 1e-6, ePSOPT.cpp:64).
    """

    max_outer: int = 20
    max_inner: int = 50
    tol_stat: float = 5e-4      # projected-gradient inf-norm (f32 floor;
                                # objective changes < 1e-5 below this)
    stat_eps: float = 3e-6      # rho-scaled stationarity floor: the AL
                                # gradient carries rho * (f32 residual
                                # noise), so pgn can never beat ~3e-6*rho
    tol_cons: float = 1e-4      # constraint violation inf-norm (the
                                # parity target is 1e-3 state error)
    rho0: float = 10.0          # initial AL penalty
    rho_growth: float = 2.0     # gentle growth: aggressive growth (5x)
                                # outruns the inner Newton on nonlinear
                                # dynamics and death-spirals into an
                                # f32-ill-conditioned subproblem (0/32
                                # scattered unicycle lanes solve at 5x,
                                # 32/32 at 2x)
    rho_max: float = 1e5        # f32: factorizations degrade beyond this
    viol_decrease: float = 0.5  # required viol reduction else rho grows
    reg: float = 1e-6           # base diagonal regularization
    hessian: str = "defect"     # constraint curvature: "defect" includes
                                # the exact dynamics curvature (λ+ρc)·∇²c
                                # — free on linear dynamics (term is 0,
                                # identical iterates) and decisive on
                                # nonlinear ones (unicycle: GN-only
                                # directions backtrack to 1e-3 steps once
                                # ρc is large). "gn" = Gauss-Newton only;
                                # "full" adds inequality curvature (can
                                # turn blocks indefinite near obstacles)
    lm0: float = 1e-3           # initial Levenberg damping (relative)
    lm_min: float = 1e-6
    lm_max: float = 30.0        # damping beyond this = at the f32 floor
    ls_backtracks: int = 24
    ls_c1: float = 1e-4
    inner_tol0: float = 1e-2    # LANCELOT-style: inner tol tightens with rho
    kkt_solver: str = "scan"    # "scan" (sequential block Cholesky) or
                                # "cr" (cyclic reduction: log-depth
                                # parallel levels; better TPU latency at
                                # long horizons)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveResult:
    """Per-problem result pytree (leading batch axis when vmapped)."""

    z: jax.Array          # [nz] primal solution
    obj: jax.Array        # [] objective (user sign convention)
    status: jax.Array     # [] int32, values of core.types.Status
    outer_iters: jax.Array
    inner_iters: jax.Array
    viol_eq: jax.Array    # [] max |c_eq|
    viol_in: jax.Array    # [] max relu(g)
    grad_norm: jax.Array  # [] final projected-gradient inf-norm
    lam_def: jax.Array    # [N, nx] defect multipliers (warm-start state)
    lam_eq: jax.Array     # [K, m_eq] user-equality multipliers
    mu: jax.Array         # [K, m_in] inequality multipliers
    rho: jax.Array        # [] final penalty


def _result_sizes(nlp: NLP, data: VGPData):
    """Static multiplier shapes via abstract evaluation."""
    d = nlp.dims
    zn = jax.ShapeDtypeStruct((d.nx + d.nu,), data.x0.dtype)
    k = jax.ShapeDtypeStruct((), jnp.int32)
    m_eq = jax.eval_shape(nlp.node_eq, zn, k, data).shape[0]
    m_in = jax.eval_shape(nlp.node_ineq, zn, k, data).shape[0]
    return m_eq, m_in


# ---------------------------------------------------------------------------
# single-problem solve (vmap for batches)
# ---------------------------------------------------------------------------


class _ALFuncs:
    """The solver's building blocks for one (nlp, cfg, data) triple —
    factored out so the debug harness (tools/debug_solver.py) can drive
    single Newton steps eagerly with full visibility."""

    def __init__(self, nlp: NLP, cfg: SolverConfig, data: VGPData,
                 box=None):
        self.nlp, self.cfg, self.data = nlp, cfg, data
        d = nlp.dims
        self.K, self.w = d.nodes, d.nx + d.nu
        self.dtype = data.x0.dtype
        lb, ub = nlp.bounds(data)
        self.lb = lb.reshape(self.K, self.w)
        self.ub = ub.reshape(self.K, self.w)
        if box is not None:
            # extra per-entry box (branch-and-bound node, variable fixing):
            # intersect with the NLP bounds
            blo, bhi = box
            self.lb = jnp.maximum(self.lb, blo.reshape(self.K, self.w))
            self.ub = jnp.minimum(self.ub, bhi.reshape(self.K, self.w))
        self.ks_step = jnp.arange(d.nsteps)
        self.ks_node = jnp.arange(self.K)
        self.pinned = (self.ub - self.lb) <= 1e-12
        # per-VARIABLE scale from the declared bounds (badly scaled
        # problems — fixed-wing positions ~1e3 vs angles ~1 — need the
        # Newton system, damping and stationarity test in scaled
        # coordinates). Deliberately not the per-node boxes: x0 pinning
        # and the terminal tolerance band would shrink those nodes'
        # scales to ~xtol and make the damped system stiff there.
        def var_scale(lo, hi):
            half = 0.5 * (hi - lo)
            ok = jnp.isfinite(half) & (half > 1e-9)
            return jnp.where(ok, jnp.clip(half, 1e-2, 1e4), 1.0)

        s_node = jnp.concatenate(
            [var_scale(data.x_lb, data.x_ub),
             var_scale(data.u_lb, data.u_ub)]
        )
        self.scale = jnp.broadcast_to(s_node, (self.K, self.w))
        # defect scaling: a defect row lives in state units, so its f32
        # noise floor is eps * |state|; dividing by max(1, state scale)
        # makes tol_cons a relative tolerance on large-range problems
        self.cscale = jnp.maximum(var_scale(data.x_lb, data.x_ub), 1.0)
        self.al_grad = jax.grad(self.al_value)

    def residuals(self, Z):
        nlp, data = self.nlp, self.data
        c_def = jax.vmap(
            lambda a, b, k: nlp.step_defect(a, b, k, data)
        )(Z[:-1], Z[1:], self.ks_step) / self.cscale
        c_eq = jax.vmap(lambda zn, k: nlp.node_eq(zn, k, data))(
            Z, self.ks_node
        )
        g = jax.vmap(lambda zn, k: nlp.node_ineq(zn, k, data))(
            Z, self.ks_node
        )
        return c_def, c_eq, g

    def cost(self, Z):
        nlp, data = self.nlp, self.data
        return jnp.sum(
            jax.vmap(lambda zn, k: nlp.node_cost(zn, k, data))(
                Z, self.ks_node
            )
        )

    def al_value(self, Z, lam_def, lam_eq, mu, rho):
        c_def, c_eq, g = self.residuals(Z)
        J = self.cost(Z)
        J = J + jnp.sum(lam_def * c_def) + 0.5 * rho * jnp.sum(c_def**2)
        J = J + jnp.sum(lam_eq * c_eq) + 0.5 * rho * jnp.sum(c_eq**2)
        s = jnp.maximum(0.0, mu + rho * g)
        J = J + (0.5 / rho) * jnp.sum(s * s - mu * mu)
        return J

    def gn_blocks(self, Z, lam_def, lam_eq, mu, rho, free, lm):
        """AL Hessian blocks: Gauss-Newton + (optionally) the exact
        constraint-curvature terms Σ s·∇²g, Σ (λ+ρc)·∇²c — without them
        the inner Newton is only linearly convergent on curved
        constraints (the ellipse obstacles are concave, so pure GN
        systematically overshoots). ``lm`` is adaptive Levenberg damping
        that restores positive definiteness when the exact terms make a
        block indefinite (detected downstream as a NaN factor)."""
        nlp, data, cfg = self.nlp, self.data, self.cfg
        w, dtype = self.w, self.dtype

        def node_blocks(zn, k, mu_k, lam_eq_k):
            Hl = jax.hessian(lambda v: nlp.node_cost(v, k, data))(zn)
            De = jnp.zeros((w, w), dtype)
            Ge = jax.jacfwd(lambda v: nlp.node_eq(v, k, data))(zn)
            if Ge.shape[0]:  # static: skip when the problem has none
                De = De + _mm(Ge.T, Ge)
            Gi = jax.jacfwd(lambda v: nlp.node_ineq(v, k, data))(zn)
            if Gi.shape[0]:
                g_k = nlp.node_ineq(zn, k, data)
                act = (mu_k + rho * g_k > 0).astype(dtype)
                De = De + _mm((Gi * act[:, None]).T, Gi)
            H = Hl + rho * De
            if cfg.hessian == "full":
                if Gi.shape[0]:
                    s = jax.lax.stop_gradient(
                        jnp.maximum(0.0, mu_k + rho * nlp.node_ineq(
                            zn, k, data))
                    )
                    H = H + jax.hessian(
                        lambda v: jnp.sum(s * nlp.node_ineq(v, k, data))
                    )(zn)
                if Ge.shape[0]:
                    se = jax.lax.stop_gradient(
                        lam_eq_k + rho * nlp.node_eq(zn, k, data)
                    )
                    H = H + jax.hessian(
                        lambda v: jnp.sum(se * nlp.node_eq(v, k, data))
                    )(zn)
            return H

        D = jax.vmap(node_blocks)(Z, self.ks_node, mu, lam_eq)

        # step coupling: defect Jacobians A_k = dc/dz_k, B_k = dc/dz_{k+1}
        def step_jacs(a, b, k):
            cs = self.cscale[:, None]
            A = jax.jacfwd(lambda v: nlp.step_defect(v, b, k, data))(a) / cs
            B = jax.jacfwd(lambda v: nlp.step_defect(a, v, k, data))(b) / cs
            return A, B

        A, B = jax.vmap(step_jacs)(Z[:-1], Z[1:], self.ks_step)
        D = D.at[:-1].add(rho * _einsum("kij,kil->kjl", A, A))
        D = D.at[1:].add(rho * _einsum("kij,kil->kjl", B, B))
        O = rho * _einsum("kij,kil->kjl", A, B)

        if cfg.hessian in ("defect", "full"):
            # exact defect curvature: hessian over the node pair of
            # (λ+ρc)·c, split into its four w×w quadrants
            def pair_curv(a, b, k, lam_k):
                cs = self.cscale
                sdef = jax.lax.stop_gradient(
                    lam_k + rho * nlp.step_defect(a, b, k, data) / cs
                )
                zpair = jnp.concatenate([a, b])
                Hp = jax.hessian(
                    lambda v: jnp.sum(
                        sdef * nlp.step_defect(v[:w], v[w:], k, data) / cs
                    )
                )(zpair)
                return Hp[:w, :w], Hp[w:, w:], Hp[:w, w:]

            Haa, Hbb, Hab = jax.vmap(pair_curv)(
                Z[:-1], Z[1:], self.ks_step, lam_def
            )
            D = D.at[:-1].add(Haa)
            D = D.at[1:].add(Hbb)
            O = O + Hab

        # scale to relative-variable coordinates: H~ = S H S. Damping and
        # the factorization then see O(1) numbers regardless of raw
        # variable ranges (fixed-wing positions vs angles)
        s = self.scale
        D = D * (s[:, :, None] * s[:, None, :])
        O = O * (s[:-1][:, :, None] * s[1:][:, None, :])

        # active-set masking: fixed rows/cols become identity
        m = free.astype(dtype)
        D = D * (m[:, :, None] * m[:, None, :])
        D = D + jnp.eye(w, dtype=dtype) * (1.0 - m)[:, None, :]
        O = O * (m[:-1][:, :, None] * m[1:][:, None, :])
        # damping keeps the factor SPD (f32) and globalizes Newton
        D = D + ((cfg.reg + lm) * (1.0 + rho)) * jnp.eye(w, dtype=dtype)
        return D, O

    def proj_grad_norm(self, Z, grad):
        """Scaled projected-gradient inf-norm: improvement available per
        relative (fraction-of-range) move, capped by the boxes."""
        s = self.scale
        pg = (Z - jnp.clip(Z - s * grad, self.lb, self.ub)) / s
        return jnp.max(jnp.abs(pg))

    def newton_step(self, Z, lam_def, lam_eq, mu, rho, lm=None):
        """One damped projected-Newton iteration; returns
        (Znew, lm_next, diagnostics)."""
        cfg = self.cfg
        lb, ub = self.lb, self.ub
        if lm is None:
            lm = jnp.asarray(cfg.lm0, self.dtype)
        grad = self.al_grad(Z, lam_def, lam_eq, mu, rho)
        at_lb = Z <= lb + 1e-9
        at_ub = Z >= ub - 1e-9
        free = ~(
            self.pinned | (at_lb & (grad > 0.0)) | (at_ub & (grad < 0.0))
        )
        D, O = self.gn_blocks(Z, lam_def, lam_eq, mu, rho, free, lm)
        # the blocks are in scaled coordinates (H~ = S H S): solve
        # H~ p~ = -S g, then p = S p~
        s = self.scale
        rhs = jnp.where(free, -(s * grad), 0.0)
        if cfg.kkt_solver == "pallas":
            # lane-major Pallas kernel under vmap; scan when unbatched
            from ..ops import pallas_bt as _pbt

            pt = _pbt.solve_auto(D, O, rhs)
            resid = rhs - btridiag.matvec(D, O, pt)
            pt = pt + _pbt.solve_auto(D, O, resid)
        elif cfg.kkt_solver == "cr":
            from ..ops import cyclic_reduction as _cr

            pt = _cr.solve(D, O, rhs)
            resid = rhs - btridiag.matvec(D, O, pt)
            pt = pt + _cr.solve(D, O, resid)
        else:
            L_diag, L_sub = btridiag.factor(D, O)
            pt = btridiag.solve_factored(L_diag, L_sub, rhs)
            # one step of iterative refinement rescues f32 accuracy when
            # rho makes the system ill-conditioned
            resid = rhs - btridiag.matvec(D, O, pt)
            pt = pt + btridiag.solve_factored(L_diag, L_sub, resid)
        p = jnp.where(free, s * pt, 0.0)
        # fall back to a damped scaled-gradient step if the factor
        # failed (indefinite block -> NaN) or the direction is uphill
        bad = ~jnp.all(jnp.isfinite(p)) | (jnp.sum(p * grad) >= 0.0)
        p = jnp.where(bad, s * rhs / ((1.0 + rho) * (1.0 + lm)), p)

        # projected backtracking Armijo line search
        val0 = self.al_value(Z, lam_def, lam_eq, mu, rho)

        def ls_body(ls_state):
            j, _, _, _ = ls_state
            alpha = 0.5**j
            Znew = jnp.clip(Z + alpha * p, lb, ub)
            val = self.al_value(Znew, lam_def, lam_eq, mu, rho)
            dec = jnp.sum(grad * (Znew - Z))
            ok = val <= val0 + cfg.ls_c1 * dec
            ok = ok & jnp.isfinite(val) & (dec < 0.0)
            return j + 1.0, ok, Znew, val

        def ls_cond(ls_state):
            j, ok, _, _ = ls_state
            return (~ok) & (j < cfg.ls_backtracks)

        nsteps_ls, ls_ok, Zc, val_new = jax.lax.while_loop(
            ls_cond,
            ls_body,
            (jnp.asarray(0.0, self.dtype), jnp.asarray(False), Z, val0),
        )
        Znew = jnp.where(ls_ok, Zc, Z)
        # Levenberg adaptation: full steps -> trust the model more;
        # backtracked or failed steps -> damp harder
        lm_next = jnp.where(
            ~ls_ok | bad,
            jnp.minimum(lm * 10.0, cfg.lm_max),
            jnp.where(
                nsteps_ls <= 1.0,
                jnp.maximum(lm * 0.33, cfg.lm_min),
                jnp.where(nsteps_ls > 3.0, lm * 3.0, lm),
            ),
        )
        diag = dict(
            grad=grad, free=free, p=p, bad=bad, ls_ok=ls_ok,
            ls_steps=nsteps_ls, val0=val0, val_new=val_new, lm=lm,
        )
        return Znew, lm_next, diag


def _solve_single(
    nlp: NLP, cfg: SolverConfig, data: VGPData, z0, lam0, rho_init=None,
    box=None,
):
    d = nlp.dims
    dtype = data.x0.dtype
    lam_def0, lam_eq0, mu0 = lam0

    F = _ALFuncs(nlp, cfg, data, box)
    lb, ub = F.lb, F.ub
    Z0 = jnp.clip(z0.reshape(F.K, F.w), lb, ub)
    residuals = F.residuals
    al_value = F.al_value
    al_grad = F.al_grad
    proj_grad_norm = F.proj_grad_norm

    # ---- inner projected-Newton loop ----------------------------------
    def inner_solve(Z, lam_def, lam_eq, mu, rho, tol_inner, lm):
        def body(state):
            Z, it, _, _, lm, noprog = state
            Znew, lm_next, diag = F.newton_step(
                Z, lam_def, lam_eq, mu, rho, lm
            )
            pgn = proj_grad_norm(
                Znew, al_grad(Znew, lam_def, lam_eq, mu, rho)
            )
            # progress tracking: two consecutive iterations that cannot
            # improve the AL beyond f32 resolution = this subproblem is
            # at its numerical floor; burning the rest of the budget
            # only wastes time (and flakes the convergence flag)
            improved = (diag["val0"] - diag["val_new"]) > 1e-7 * (
                1.0 + jnp.abs(diag["val0"])
            )
            noprog = jnp.where(improved, 0, noprog + 1)
            stalled = noprog >= 2
            done = (pgn <= tol_inner) | stalled
            return Znew, it + 1, done, stalled, lm_next, noprog

        def cond(state):
            _, it, done, _, _, _ = state
            return (~done) & (it < cfg.max_inner)

        Z, it, conv, stalled, lm, _ = jax.lax.while_loop(
            cond,
            body,
            (
                Z,
                jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
                jnp.asarray(False),
                lm,
                jnp.asarray(0, jnp.int32),
            ),
        )
        # conv: exited via the done test (stationary or stalled), not by
        # exhausting the budget
        return Z, it, lm, stalled, conv

    # ---- outer AL loop ------------------------------------------------
    def outer_body(state):
        (Z, lam_def, lam_eq, mu, rho, omega, lm, viol_prev, o_it, i_tot,
         _, _) = state
        stat_floor = jnp.maximum(cfg.tol_stat, cfg.stat_eps * rho)
        tol_inner = jnp.maximum(stat_floor, omega)
        Z, it, lm, stalled, conv = inner_solve(
            Z, lam_def, lam_eq, mu, rho, tol_inner, lm
        )
        c_def, c_eq, g = residuals(Z)
        viol = jnp.maximum(
            jnp.max(jnp.abs(c_def), initial=0.0),
            jnp.max(jnp.abs(c_eq), initial=0.0),
        )
        viol = jnp.maximum(viol, jnp.max(jnp.maximum(g, 0.0), initial=0.0))
        # KKT test at the *current* multipliers: the AL gradient equals the
        # Lagrangian gradient up to O(rho*viol), so small viol + inner
        # stationarity ⇒ KKT point
        pgn = proj_grad_norm(Z, al_grad(Z, lam_def, lam_eq, mu, rho))
        # KKT, up to the f32 floor: feasible + inner-stationary. An inner
        # loop that stalled at its numerical floor counts as stationary
        # provided pgn is within a sanity factor of the rho-scaled floor.
        done = (viol <= cfg.tol_cons) & (
            (pgn <= stat_floor) | (stalled & (pgn <= 100.0 * stat_floor))
        )
        # first-order multiplier update
        lam_def = lam_def + rho * c_def
        lam_eq = lam_eq + rho * c_eq
        mu = jnp.maximum(0.0, mu + rho * g)
        # grow the penalty only while actually infeasible — growing it
        # during the stationarity-polish phase explodes the AL gradient.
        # NOTE on CPU test flakiness: AL from an infeasible guess on a
        # nonconvex field is knife-edge basin-sensitive, and XLA-CPU
        # reduction order varies with machine load, so single-start CPU
        # runs of hard problems are not run-to-run reproducible — use
        # solve_multistart (+ shooting seeds) for those.
        grow = (
            (viol > cfg.viol_decrease * viol_prev)
            & (viol > cfg.tol_cons)
            & (~done)
        )
        rho = jnp.where(
            grow, jnp.minimum(rho * cfg.rho_growth, cfg.rho_max), rho
        )
        # LANCELOT omega-schedule: tighten the inner tolerance on good
        # progress, reset against the new penalty on bad progress
        omega = jnp.where(
            grow,
            cfg.inner_tol0 / rho,
            jnp.maximum(omega * 0.2, cfg.tol_stat),
        )
        # relax the damping a little at each new outer problem so a
        # high-lm episode doesn't slow later (easier) subproblems
        lm = jnp.maximum(lm * 0.1, cfg.lm0)
        return (
            Z, lam_def, lam_eq, mu, rho, omega, lm, viol, o_it + 1,
            i_tot + it, done, pgn,
        )

    def outer_cond(state):
        *_, o_it, _, done, _pgn = state
        return (~done) & (o_it < cfg.max_outer)

    rho0 = (
        jnp.asarray(cfg.rho0, dtype)
        if rho_init is None
        else jnp.asarray(rho_init, dtype)
    )
    init = (
        Z0,
        lam_def0,
        lam_eq0,
        mu0,
        rho0,
        jnp.asarray(cfg.inner_tol0, dtype),
        jnp.asarray(cfg.lm0, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, dtype),
    )
    (Z, lam_def, lam_eq, mu, rho, omega, lm, viol, o_it, i_tot, done,
     pgn) = jax.lax.while_loop(outer_cond, outer_body, init)

    c_def, c_eq, g = residuals(Z)
    viol_eq = jnp.maximum(
        jnp.max(jnp.abs(c_def), initial=0.0),
        jnp.max(jnp.abs(c_eq), initial=0.0),
    )
    viol_in = jnp.max(jnp.maximum(g, 0.0), initial=0.0)
    z = Z.reshape(-1)
    nan = ~jnp.all(jnp.isfinite(z))
    status = jnp.where(
        nan,
        jnp.int32(Status.DIVERGED),
        jnp.where(
            done, jnp.int32(Status.SOLVED), jnp.int32(Status.MAX_ITER)
        ),
    )
    return SolveResult(
        z=z,
        obj=nlp.score(z, data),
        status=status,
        outer_iters=o_it,
        inner_iters=i_tot,
        viol_eq=viol_eq,
        viol_in=viol_in,
        grad_norm=pgn,
        lam_def=lam_def,
        lam_eq=lam_eq,
        mu=mu,
        rho=rho,
    )


def init_multipliers(nlp: NLP, data: VGPData):
    """Zero multipliers of the right static shape (cold start)."""
    d = nlp.dims
    m_eq, m_in = _result_sizes(nlp, data)
    dtype = data.x0.dtype
    return (
        jnp.zeros((d.nsteps, d.nx), dtype),
        jnp.zeros((d.nodes, m_eq), dtype),
        jnp.zeros((d.nodes, m_in), dtype),
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def solve(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    z0: Optional[jax.Array] = None,
    lam0=None,
    rho0: Optional[jax.Array] = None,
) -> SolveResult:
    """Solve one VGP. ``z0``/``lam0``/``rho0`` warm-start (MPC fast
    path: pass the previous result's z, multipliers and penalty so the
    re-solve starts at the already-calibrated penalty level)."""
    if z0 is None:
        z0 = nlp.initial_guess(data)
    if lam0 is None:
        lam0 = init_multipliers(nlp, data)
    return _solve_single(nlp, cfg, data, z0, lam0, rho0)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 6))
def solve_multistart(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    n_starts: int = 8,
    key: Optional[jax.Array] = None,
    spread: float = 0.4,
    shooting_samples: int = 0,
) -> SolveResult:
    """Solve one VGP from ``n_starts`` initial guesses at once and keep
    the best feasible result.

    The batch axis is the global-search mechanism that replaces the MILP
    backends' branch-and-bound (SURVEY.md §7 hard parts): nonconvex
    obstacle fields have multiple basins (pass above vs. below), and a
    straight-line guess can start in a blocked one — AL from an
    infeasible guess is knife-edge sensitive to which basin it drains
    into. Guesses: the nominal one, smooth half-sine state bumps, and
    (``shooting_samples > 0``) the best collision-free randomized
    rollout (solve.shooting) — a dynamically consistent, obstacle-free
    seed that stabilizes hard fields.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    d = nlp.dims
    K, w = d.nodes, d.nx + d.nu
    base = nlp.initial_guess(data).reshape(K, w)
    lam0 = init_multipliers(nlp, data)

    # smooth state-space bumps, zero at both ends (x0/xf respected)
    window = jnp.sin(jnp.pi * jnp.arange(K) / (K - 1))[:, None]
    deltas = jax.random.uniform(
        key, (n_starts, d.nx), minval=-spread, maxval=spread
    ) * (data.x_ub - data.x_lb)
    deltas = deltas.at[0].set(0.0)  # start 0 = the nominal guess

    def make_guess(delta):
        X = base[:, : d.nx] + window * delta
        return jnp.concatenate([X, base[:, d.nx :]], axis=-1).reshape(-1)

    z0s = jax.vmap(make_guess)(deltas)
    if shooting_samples > 0:
        from . import shooting as _shooting

        z_shoot = _shooting.plan_guess(
            nlp, data, n_samples=shooting_samples, key=key
        )
        z0s = z0s.at[1 % n_starts].set(z_shoot)
    res = jax.vmap(
        lambda z: _solve_single(nlp, cfg, data, z, lam0)
    )(z0s)

    feas = (res.viol_eq <= 10.0 * cfg.tol_cons) & (
        res.viol_in <= 10.0 * cfg.tol_cons
    )
    sign = -1.0 if nlp.maximize else 1.0
    score = jnp.where(
        jnp.isfinite(res.obj), sign * res.obj, jnp.inf
    ) + jnp.where(feas, 0.0, 1e9)
    best = jnp.argmin(score)
    return jax.tree.map(lambda a: a[best], res)


@functools.partial(jax.jit, static_argnums=(0, 1))
def solve_batched(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    z0: Optional[jax.Array] = None,
    lam0=None,
    rho0: Optional[jax.Array] = None,
) -> SolveResult:
    """Solve a batch: every leaf of ``data`` has a leading batch axis.

    ``vmap`` over lanes — diverged lanes carry their own status instead of
    poisoning the batch. ``z0`` [B, nz], ``lam0`` (each leaf [B, ...])
    and ``rho0`` [B] warm-start the whole fleet (MPC at scale).
    """
    if z0 is None:
        z0 = jax.vmap(nlp.initial_guess)(data)
    if lam0 is None:
        B = z0.shape[0]
        one = init_multipliers(
            nlp, jax.tree.map(lambda a: a[0], data)
        )
        lam0 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), one
        )
    if rho0 is None:
        return jax.vmap(
            lambda dat, z, l: _solve_single(nlp, cfg, dat, z, l)
        )(data, z0, lam0)
    return jax.vmap(
        lambda dat, z, l, r: _solve_single(nlp, cfg, dat, z, l, r)
    )(data, z0, lam0, rho0)
