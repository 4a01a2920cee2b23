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


# step-size grid for the parallel line search: the same halving schedule
# the sequential 24-deep backtracking search walked, evaluated all at
# once. (A thinned grid — skipping exponents past 7 — measurably loses
# converged lanes on the canonical nonconvex fields: stiff high-rho
# subproblems live or die on exact step sizes.)
_LS_EXPONENTS = tuple(range(24))


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
    ls_grid: int = 24           # parallel line search: the first ls_grid
                                # alphas of _LS_EXPONENTS, evaluated in ONE
                                # batched residual pass (a sequential
                                # backtracking while_loop runs lockstep
                                # across a vmapped batch — one deep-
                                # backtracking lane makes every lane pay
                                # per step). The grid is dense near 1 and
                                # reaches ~1e-7: stiff high-rho subproblems
                                # genuinely need tiny steps, and treating
                                # them as failures stalls the lane and
                                # death-spirals the penalty schedule
    max_total: int = 0          # global Newton-iteration budget across all
                                # outer rounds; 0 = max_outer * max_inner.
                                # The real wall-clock knob for batched
                                # solves: the slowest lane defines the
                                # runtime of the whole vmapped while_loop
    inner_tol0: float = 1e-2    # LANCELOT-style: inner tol tightens with rho
    stall_tol: float = 1e-7     # relative AL-decrease floor: two straight
                                # iterations below it end the inner round.
                                # Measured pathology on the N=50 UAS
                                # bench: after ~10 productive Newton steps
                                # a round enters a zigzag limit cycle
                                # improving ~1e-5/iter and burns the rest
                                # of max_inner; raising this to ~1e-5
                                # (with a fast rho ramp) exits the cycle
                                # and fires the multiplier update instead
    kkt_solver: str = "scan"    # "scan" (sequential block Cholesky) or
                                # "cr" (cyclic reduction: log-depth
                                # parallel levels; better TPU latency at
                                # long horizons)
    ls_eta: float = 0.0         # Zhang-Hager nonmonotone line search:
                                # accept against the decaying average
                                # C_k of past AL values instead of the
                                # last value (eta = averaging memory,
                                # 0 = classic monotone Armijo). The
                                # zigzag limit cycle is a monotone-
                                # acceptance artifact: the full Newton
                                # step across a curved AL valley briefly
                                # raises the value and gets cut to 1e-3
                                # steps; nonmonotone acceptance lets it
                                # through (measured r3: p50 Newton
                                # iterations 942 -> ~600 alone, and the
                                # enabler for the viol-patience exit)
    round_viol_patience: int = 8  # end an inner AL round early when the
                                # constraint violation has not improved
                                # by round_viol_factor over the last
                                # `patience` Newton iterations (0 = off —
                                # only sane together with lm_rule="ratio":
                                # under the oscillating "count" damping
                                # the inner solve needs its full budget).
                                # Measured r3 pathology: inner rounds
                                # burn max_inner=100 iterations grinding
                                # the AL value ~1e-3/iter while viol
                                # moves < 1%/iter — the multiplier
                                # update + rho ramp they are delaying is
                                # worth far more than the grinding
    round_viol_factor: float = 0.9
    dual_relax: float = 1.0     # over-relaxation of the multiplier
                                # update (lambda += relax * rho * c;
                                # PHR clip applies after): > 1 is the
                                # cheap SOR-flavored acceleration of
                                # the dual sequence (cf. ADMM's
                                # relaxation parameter ~1.6-1.8)
    ls_exponents: tuple = ()    # explicit line-search exponent grid
                                # (alphas = 0.5^e); empty = the dense
                                # 0..ls_grid-1 default. A sparse-tail
                                # grid (dense near 1, log-spaced to
                                # ~2^-22) keeps the RANGE the stiff
                                # lanes need at ~half the candidates —
                                # truncating the range (ls_grid=8/12)
                                # is what collapses the solve rate
    ls_deep_round: int = 0      # treat an accepted step at alpha <=
                                # 2^-this as stall evidence (a deep
                                # micro-polish step means the direction
                                # is fighting the AL kink — the
                                # multiplier update is worth more than
                                # another polish; 0 = off). Two
                                # consecutive such steps end the round
                                # via the existing noprog counter.
    ls_rule: str = "first"      # which passing Armijo candidate to take:
                                # "first" = largest passing alpha,
                                # "best" = lowest AL value among passing
                                # candidates (free — the grid is already
                                # evaluated in one batched pass).
                                # Default "first": the greedy rule can
                                # drain into a spurious AL minimum with
                                # a node stuck inside an obstacle
                                # (measured: N=16 canonical OCP diverges
                                # under "best", solves under "first"),
                                # and on the UAS bench "best" buys < 5%
    sep_assembly: bool = True   # separable-scheme fast Hessian assembly
                                # (euler/trapezoidal, memoryless): the
                                # defect couples adjacent nodes only
                                # through f evaluated at EACH node, so
                                # per-node dynamics Jacobians/Hessians
                                # are shared between the two steps that
                                # touch the node (the generic path
                                # computes each twice, over node PAIRS)
                                # and the cross-node curvature quadrant
                                # is exactly zero. Same math, ~half the
                                # assembly AD work; False = the generic
                                # pair path (kill switch / A-B testing)
    chord_steps: int = 0        # Shamanskii/chord composite iteration:
                                # after each full Newton step (Hessian
                                # assembly + factor + line search), run
                                # this many REUSE steps that re-solve
                                # the stored KKT blocks with a fresh
                                # gradient — skipping the assembly that
                                # dominates the iteration (~5 of 7.5 ms
                                # at B=1024, docs/perf.md). Stale blocks
                                # (moved Z, updated multipliers, grown
                                # rho) are guarded by the same Armijo
                                # line search; 0 = classic one-assembly-
                                # per-step iteration
    lm_rule: str = "ratio"      # Levenberg adaptation signal: "count"
                                # (backtrack depth; oscillates between
                                # under- and over-damped on zigzag
                                # lanes) or "ratio" (trust-region style
                                # actual/predicted decrease along the
                                # Newton direction; settles)


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
    zn = jax.ShapeDtypeStruct((d.node_width,), data.x0.dtype)
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
                 box=None, kkt_solve=None):
        # optional KKT override: f(D, O, rhs) -> direction, e.g. the
        # horizon-sharded SPIKE solve (parallel/kkt.py) under a mesh
        self.kkt_solve = kkt_solve
        self.nlp, self.cfg, self.data = nlp, cfg, data
        d = nlp.dims
        self.K, self.w = d.nodes, d.node_width
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
        # scaling + cached track centers are NLP policy (delegated so
        # condensed/delayed problem views can override them)
        self.scale = jnp.broadcast_to(
            nlp.variable_scales(data), (self.K, self.w)
        )
        self.cscale = nlp.defect_scales(data)
        self.track_ctrs = nlp.track_center_table(data)
        self.al_grad = jax.grad(self.al_value)

    def node_ineq_c(self, zn, k, tc_k):
        """nlp.node_ineq with the precomputed track-center row tc_k
        [T, D] — identical values and stacking order."""
        return self.nlp.node_ineq_cached(zn, k, tc_k, self.data)

    def residuals(self, Z):
        nlp, data = self.nlp, self.data
        if nlp.delay:
            c_def = jax.vmap(
                lambda W, k: nlp.pair_defect(W, k, data)
            )(nlp.step_windows(Z), self.ks_step) / self.cscale
        else:
            c_def = jax.vmap(
                lambda a, b, k: nlp.step_defect(a, b, k, data)
            )(Z[:-1], Z[1:], self.ks_step) / self.cscale
        c_eq = jax.vmap(lambda zn, k: nlp.node_eq(zn, k, data))(
            Z, self.ks_node
        )
        g = jax.vmap(self.node_ineq_c)(Z, self.ks_node, self.track_ctrs)
        return c_def, c_eq, g

    def cost(self, Z):
        nlp, data = self.nlp, self.data
        return jnp.sum(
            jax.vmap(lambda zn, k: nlp.node_cost(zn, k, data))(
                Z, self.ks_node
            )
        )

    def al_from_parts(self, J, c_def, c_eq, g, lam_def, lam_eq, mu, rho):
        """Assemble the AL value from already-computed residual parts
        (elementwise — lets the line search and the outer update share one
        residual evaluation)."""
        J = J + jnp.sum(lam_def * c_def) + 0.5 * rho * jnp.sum(c_def**2)
        J = J + jnp.sum(lam_eq * c_eq) + 0.5 * rho * jnp.sum(c_eq**2)
        s = jnp.maximum(0.0, mu + rho * g)
        J = J + (0.5 / rho) * jnp.sum(s * s - mu * mu)
        return J

    def al_value(self, Z, lam_def, lam_eq, mu, rho):
        c_def, c_eq, g = self.residuals(Z)
        return self.al_from_parts(
            self.cost(Z), c_def, c_eq, g, lam_def, lam_eq, mu, rho
        )

    def gn_blocks(self, Z, lam_def, lam_eq, mu, rho, free, lm, g=None):
        """AL Hessian blocks: Gauss-Newton + (optionally) the exact
        constraint-curvature terms Σ s·∇²g, Σ (λ+ρc)·∇²c — without them
        the inner Newton is only linearly convergent on curved
        constraints (the ellipse obstacles are concave, so pure GN
        systematically overshoots). ``lm`` is adaptive Levenberg damping
        that restores positive definiteness when the exact terms make a
        block indefinite (detected downstream as a NaN factor).

        ``g`` optionally carries the already-computed inequality
        residuals at ``Z`` ([K, m_in], the solver loop has them) so the
        active-set test costs nothing. Obstacle rows read only the
        state's position dims, so their GN product lands in a
        [pd, pd] corner block instead of a dense [w, w] one — the
        jacfwd needs pd tangents, not w."""
        nlp, data, cfg = self.nlp, self.data, self.cfg
        w, dtype = self.w, self.dtype
        d = nlp.dims
        pd = nlp.pos_dims(data)
        if g is None:
            g = jax.vmap(self.node_ineq_c)(
                Z, self.ks_node, self.track_ctrs
            )
        m_obs = jax.eval_shape(
            nlp.node_ineq_obs,
            jax.ShapeDtypeStruct((d.nx,), dtype),
            jax.ShapeDtypeStruct((), jnp.int32),
            jax.ShapeDtypeStruct(self.track_ctrs.shape[1:], dtype),
            data,
        ).shape[0]

        def node_blocks(zn, k, mu_k, lam_eq_k, tc_k, g_k):
            Hl = jax.hessian(lambda v: nlp.node_cost(v, k, data))(zn)
            De = jnp.zeros((w, w), dtype)
            Ge = jax.jacfwd(lambda v: nlp.node_eq(v, k, data))(zn)
            if Ge.shape[0]:  # static: skip when the problem has none
                De = De + _mm(Ge.T, Ge)
            act = (mu_k + rho * g_k > 0).astype(dtype)
            if m_obs:
                x = zn[: d.nx]
                Go = jax.jacfwd(
                    lambda v: nlp.node_ineq_obs(
                        x.at[:pd].set(v), k, tc_k, data
                    )
                )(x[:pd])  # [m_obs, pd]
                Goa = Go * act[:m_obs, None]
                De = De.at[:pd, :pd].add(_mm(Goa.T, Go))
            Gu = jax.jacfwd(lambda v: nlp.node_ineq_user(v, k, data))(zn)
            if Gu.shape[0]:
                De = De + _mm((Gu * act[m_obs:, None]).T, Gu)
            H = Hl + rho * De
            if cfg.hessian == "full":
                s = jax.lax.stop_gradient(
                    jnp.maximum(0.0, mu_k + rho * g_k)
                )
                if m_obs:
                    Hoo = jax.hessian(
                        lambda v: jnp.sum(
                            s[:m_obs] * nlp.node_ineq_obs(
                                x.at[:pd].set(v), k, tc_k, data
                            )
                        )
                    )(x[:pd])
                    H = H.at[:pd, :pd].add(Hoo)
                if Gu.shape[0]:
                    H = H + jax.hessian(
                        lambda v: jnp.sum(
                            s[m_obs:] * nlp.node_ineq_user(v, k, data)
                        )
                    )(zn)
                if Ge.shape[0]:
                    se = jax.lax.stop_gradient(
                        lam_eq_k + rho * nlp.node_eq(zn, k, data)
                    )
                    H = H + jax.hessian(
                        lambda v: jnp.sum(se * nlp.node_eq(v, k, data))
                    )(zn)
            return H

        D = jax.vmap(node_blocks)(
            Z, self.ks_node, mu, lam_eq, self.track_ctrs, g
        )

        # step coupling: defect Jacobians A_k = dc/dz_k, B_k = dc/dz_{k+1}.
        # Delayed problems (nlp.delay > 0) differentiate only the two
        # newest window nodes — older-node coupling stays out of the
        # Hessian (kept block-tridiagonal; gradients remain exact via
        # al_grad, so this is an inexact-Newton preconditioner, not an
        # approximation of the problem)
        sep = (
            cfg.sep_assembly
            and not nlp.delay
            and nlp.scheme in ("euler", "trapezoidal")
        )
        if sep:
            # separable-scheme fast path: c_k depends on f(z_k) and
            # f(z_{k+1}) SEPARATELY (collocation.py step_defect), so one
            # per-node dynamics Jacobian serves both adjacent steps (the
            # generic pair path below computes it twice) and — used for
            # the curvature further down — the cross-node quadrant of
            # ∇²(s·c) is exactly zero
            nx = d.nx
            dt = data.dt
            cs = self.cscale

            def fnode(zn, k):
                x, u, _ = nlp._split(zn)
                t = k.astype(zn.dtype) * dt
                return nlp.dynamics(x, u, t, data)

            fvals = jax.vmap(fnode)(Z, self.ks_node)
            Jn = jax.vmap(
                lambda zn, k: jax.jacfwd(lambda v: fnode(v, k))(zn)
            )(Z, self.ks_node)  # [K, nx, w]
            Js = Jn / cs[None, :, None]
            Ecs = (
                jnp.zeros((nx, w), dtype)
                .at[:, :nx].set(jnp.eye(nx, dtype=dtype))
                / cs[:, None]
            )
            if nlp.scheme == "euler":
                # c = x1 - x0 - dt f(z1): A constant, curvature b-only
                A = jnp.broadcast_to(
                    -Ecs[None], (self.K - 1, nx, w)
                )
                B = Ecs[None] - dt * Js[1:]
            else:  # trapezoidal: c = x1 - x0 - dt/2 (f(z0) + f(z1))
                A = -Ecs[None] - (0.5 * dt) * Js[:-1]
                B = Ecs[None] - (0.5 * dt) * Js[1:]
        elif nlp.delay:
            Wn = nlp.step_windows(Z)

            def step_jacs(Wk, k):
                cs = self.cscale[:, None]
                A = jax.jacfwd(
                    lambda v: nlp.pair_defect(Wk.at[-2].set(v), k, data)
                )(Wk[-2]) / cs
                B = jax.jacfwd(
                    lambda v: nlp.pair_defect(Wk.at[-1].set(v), k, data)
                )(Wk[-1]) / cs
                return A, B

            A, B = jax.vmap(step_jacs)(Wn, self.ks_step)
        else:
            def step_jacs(a, b, k):
                cs = self.cscale[:, None]
                A = jax.jacfwd(
                    lambda v: nlp.step_defect(v, b, k, data)
                )(a) / cs
                B = jax.jacfwd(
                    lambda v: nlp.step_defect(a, v, k, data)
                )(b) / cs
                return A, B

            A, B = jax.vmap(step_jacs)(Z[:-1], Z[1:], self.ks_step)
        D = D.at[:-1].add(rho * _einsum("kij,kil->kjl", A, A))
        D = D.at[1:].add(rho * _einsum("kij,kil->kjl", B, B))
        O = rho * _einsum("kij,kil->kjl", A, B)

        if cfg.hessian in ("defect", "full") and sep:
            # separable fast path: ∇²_{z_k}(s·c) = coef ∇²((s/cs)·f)(z_k)
            # with zero cross-node quadrant. Node k's total contribution
            # sums the weights of BOTH steps touching it (linearity of
            # the contraction), so ONE w-dim scalar hessian per node
            # replaces one 2w-dim hessian per step.
            X0 = Z[:, : d.nx]
            if nlp.scheme == "euler":
                cdef = X0[1:] - X0[:-1] - dt * fvals[1:]
            else:
                cdef = (
                    X0[1:] - X0[:-1]
                    - (0.5 * dt) * (fvals[:-1] + fvals[1:])
                )
            s_eff = jax.lax.stop_gradient(
                (lam_def + rho * (cdef / cs)) / cs
            )  # [nsteps, nx]
            if nlp.scheme == "euler":
                wn = jnp.concatenate(
                    [jnp.zeros((1, d.nx), dtype), s_eff], axis=0
                )
                coef = -dt
            else:
                wn = (
                    jnp.zeros((self.K, d.nx), dtype)
                    .at[:-1].add(s_eff)
                    .at[1:].add(s_eff)
                )
                coef = -0.5 * dt
            Hn = jax.vmap(
                lambda zn, k, wk: jax.hessian(
                    lambda v: jnp.sum(wk * fnode(v, k))
                )(zn)
            )(Z, self.ks_node, wn)
            D = D + coef * Hn
        elif cfg.hessian in ("defect", "full"):
            # exact defect curvature: hessian over the node pair of
            # (λ+ρc)·c, split into its four w×w quadrants (delayed
            # problems: curvature of the two newest window nodes only,
            # matching the Jacobian truncation above)
            if nlp.delay:
                def pair_curv(Wk, k, lam_k):
                    cs = self.cscale
                    sdef = jax.lax.stop_gradient(
                        lam_k + rho * nlp.pair_defect(Wk, k, data) / cs
                    )
                    zpair = jnp.concatenate([Wk[-2], Wk[-1]])
                    Hp = jax.hessian(
                        lambda v: jnp.sum(
                            sdef * nlp.pair_defect(
                                Wk.at[-2].set(v[:w]).at[-1].set(v[w:]),
                                k, data,
                            ) / cs
                        )
                    )(zpair)
                    return Hp[:w, :w], Hp[w:, w:], Hp[:w, w:]

                Haa, Hbb, Hab = jax.vmap(pair_curv)(
                    Wn, self.ks_step, lam_def
                )
            else:
                def pair_curv(a, b, k, lam_k):
                    cs = self.cscale
                    sdef = jax.lax.stop_gradient(
                        lam_k + rho * nlp.step_defect(a, b, k, data) / cs
                    )
                    zpair = jnp.concatenate([a, b])
                    Hp = jax.hessian(
                        lambda v: jnp.sum(
                            sdef
                            * nlp.step_defect(v[:w], v[w:], k, data) / cs
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

    def direction(self, Z, grad, lam_def, lam_eq, mu, rho, lm, g=None):
        """Damped projected-Newton direction from a precomputed AL
        gradient; returns (p, bad). ``g`` optionally carries the
        inequality residuals at Z (reused by the active-set test)."""
        p, bad, _, _, _ = self.direction_ext(
            Z, grad, lam_def, lam_eq, mu, rho, lm, g
        )
        return p, bad

    def direction_ext(self, Z, grad, lam_def, lam_eq, mu, rho, lm,
                      g=None):
        """:meth:`direction` + the assembled (D, O) blocks and free
        mask, so chord (Hessian-reuse) steps can re-solve against them
        (cfg.chord_steps)."""
        cfg = self.cfg
        at_lb = Z <= self.lb + 1e-9
        at_ub = Z >= self.ub - 1e-9
        free = ~(
            self.pinned | (at_lb & (grad > 0.0)) | (at_ub & (grad < 0.0))
        )
        D, O = self.gn_blocks(Z, lam_def, lam_eq, mu, rho, free, lm, g)
        p, bad = self.direction_from_blocks(D, O, free, grad, rho, lm)
        return p, bad, D, O, free

    def direction_from_blocks(self, D, O, free, grad, rho, lm):
        """Solve the KKT system against already-assembled blocks.

        The chord/Shamanskii path: a reuse step re-solves stored (D, O)
        with a FRESH gradient — skipping the Hessian assembly that
        dominates the iteration (docs/perf.md: ~5 of 7.5 ms at B=1024).
        The stored damping is adjusted to the current ``lm`` by the
        caller; the line search guards the staleness."""
        cfg = self.cfg
        # the blocks are in scaled coordinates (H~ = S H S): solve
        # H~ p~ = -S g, then p = S p~
        s = self.scale
        rhs = jnp.where(free, -(s * grad), 0.0)
        if self.kkt_solve is not None:
            # externally supplied solver (horizon-sharded SPIKE): one
            # refinement pass for f32 parity with the local paths
            pt = self.kkt_solve(D, O, rhs)
            resid = rhs - btridiag.matvec(D, O, pt)
            pt = pt + self.kkt_solve(D, O, resid)
        elif cfg.kkt_solver == "pallas":
            # lane-major Pallas kernel under vmap (one in-kernel
            # refinement pass reusing the factor — no second factorize)
            from ..ops import pallas_bt as _pbt

            pt = _pbt.solve_auto(D, O, rhs)
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
        return p, bad

    def chord_direction(self, Dst, Ost, free_st, dmp_st, grad, rho, lm):
        """Direction from STORED blocks with the damping diagonal
        re-centred on the current (rho, lm): D_eff = Dst + (dmp_now -
        dmp_st) I — exact for the damping term; residual staleness
        (moved Z, updated multipliers, grown rho inside the blocks) is
        what the Armijo guard absorbs."""
        cfg = self.cfg
        w = self.w
        dmp_now = (cfg.reg + lm) * (1.0 + rho)
        D_eff = Dst + (dmp_now - dmp_st) * jnp.eye(w, dtype=self.dtype)
        return self.direction_from_blocks(
            D_eff, Ost, free_st, grad, rho, lm
        )

    def newton_step(self, Z, lam_def, lam_eq, mu, rho, lm=None):
        """One damped projected-Newton iteration; returns
        (Znew, lm_next, diagnostics)."""
        cfg = self.cfg
        lb, ub = self.lb, self.ub
        if lm is None:
            lm = jnp.asarray(cfg.lm0, self.dtype)
        grad = self.al_grad(Z, lam_def, lam_eq, mu, rho)
        p, bad = self.direction(Z, grad, lam_def, lam_eq, mu, rho, lm)
        at_lb = Z <= lb + 1e-9
        at_ub = Z >= ub - 1e-9
        free = ~(
            self.pinned | (at_lb & (grad > 0.0)) | (at_ub & (grad < 0.0))
        )

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
    box=None, kkt_solve=None, trace_iters: int = 0,
):
    """Flattened AL-SQP: ONE ``lax.while_loop`` over Newton iterations.

    The textbook nesting (outer AL rounds, each running an inner Newton
    loop to tolerance) is hostile to a vmapped batch: every loop level
    runs lockstep until the WORST lane's budget is spent, so one hard
    lane drags the whole fleet through max_outer x max_inner masked
    iterations. Here the outer multiplier/penalty update is folded into
    the single iteration stream as an elementwise state transition that
    fires per lane whenever that lane's inner subproblem has converged
    (stationary to the LANCELOT omega-tolerance, stalled at its f32
    floor, or out of its per-round budget). Every loop iteration is a
    useful Newton step for every unconverged lane regardless of which
    AL round it is in, and one global budget (``cfg.max_total``) bounds
    the wall clock.

    The line search evaluates the whole geometric step grid
    0.5^j (j < ls_grid) in ONE batched residual pass instead of a
    sequential backtracking while_loop (which a vmapped batch runs at
    the speed of its deepest-backtracking lane), and the accepted
    candidate's residuals feed the multiplier update for free.
    """
    d = nlp.dims
    dtype = data.x0.dtype
    lam_def0, lam_eq0, mu0 = lam0

    F = _ALFuncs(nlp, cfg, data, box, kkt_solve)
    lb, ub = F.lb, F.ub
    Z0 = jnp.clip(z0.reshape(F.K, F.w), lb, ub)

    max_total = cfg.max_total or cfg.max_outer * cfg.max_inner
    if cfg.ls_exponents:
        exps_t = tuple(cfg.ls_exponents)
    else:
        exps_t = _LS_EXPONENTS[: max(min(cfg.ls_grid,
                                         len(_LS_EXPONENTS)), 1)]
    nls = len(exps_t)
    alphas = 0.5 ** jnp.asarray(exps_t, dtype)

    cd0, ce0, g0 = F.residuals(Z0)
    cost0 = F.cost(Z0)

    rho0 = (
        jnp.asarray(cfg.rho0, dtype)
        if rho_init is None
        else jnp.asarray(rho_init, dtype)
    )

    def body_diag(st, reuse: bool = False):
        (Z, cd, ce, g, cost, lam_def, lam_eq, mu, rho, omega, lm,
         viol_prev, C, Q, viol_ref, Dst, Ost, free_st, dmp_st,
         noprog, in_it, o_it, tot, done, _pgn) = st

        # ---- gradient/value at the CURRENT consistent (Z, multiplier)
        # pair; residuals are carried, so the value assembly is free
        grad = F.al_grad(Z, lam_def, lam_eq, mu, rho)
        val = F.al_from_parts(cost, cd, ce, g, lam_def, lam_eq, mu, rho)
        # nonmonotone reference value (Zhang-Hager): inf marks "re-init
        # at the next iteration" (round starts, where the multiplier
        # update moved the AL surface)
        if cfg.ls_eta > 0.0:
            C = jnp.where(jnp.isfinite(C), C, val)
            ref = C
        else:
            ref = val
        pgn = F.proj_grad_norm(Z, grad)
        stat_floor = jnp.maximum(cfg.tol_stat, cfg.stat_eps * rho)
        tol_inner = jnp.maximum(stat_floor, omega)
        stalled = noprog >= 2
        inner_done = (pgn <= tol_inner) | stalled | (in_it >= cfg.max_inner)

        viol = jnp.maximum(
            jnp.max(jnp.abs(cd), initial=0.0),
            jnp.max(jnp.abs(ce), initial=0.0),
        )
        viol = jnp.maximum(viol, jnp.max(jnp.maximum(g, 0.0), initial=0.0))
        # violation-stagnation round exit: when the last `patience`
        # Newton iterations moved viol by less than (1 - factor), the
        # inner grinding is worth less than the multiplier update
        if cfg.round_viol_patience > 0:
            pat = cfg.round_viol_patience
            check = (in_it >= pat) & (in_it % pat == 0)
            inner_done = inner_done | (
                check & (viol > cfg.round_viol_factor * viol_ref)
            )
            viol_ref = jnp.where(check, viol, viol_ref)
        # KKT test at the current multipliers: the AL gradient equals the
        # Lagrangian gradient up to O(rho*viol), so small viol + inner
        # stationarity => KKT point (stalled lanes pass with a sanity
        # factor on the rho-scaled f32 floor)
        done_now = inner_done & (viol <= cfg.tol_cons) & (
            (pgn <= stat_floor) | (stalled & (pgn <= 100.0 * stat_floor))
        )
        done_prev = done
        done = done | done_now

        # ---- Newton step for lanes still inside an inner round --------
        # (lanes at an inner-round boundary spend this iteration on the
        # multiplier update below: their step would mix a stale gradient
        # with fresh multipliers)
        if reuse:
            # chord step: fresh gradient against the STORED blocks
            p, bad_dir = F.chord_direction(
                Dst, Ost, free_st, dmp_st, grad, rho, lm
            )
        elif cfg.chord_steps:
            p, bad_dir, Dst, Ost, free_st = F.direction_ext(
                Z, grad, lam_def, lam_eq, mu, rho, lm, g
            )
            dmp_st = (cfg.reg + lm) * (1.0 + rho)
        else:
            p, bad_dir = F.direction(
                Z, grad, lam_def, lam_eq, mu, rho, lm, g
            )

        # parallel Armijo line search over the alpha grid. (A moving
        # 8-candidate window anchored at the last accepted exponent was
        # tried and REVERTED: the zigzag lanes alternate between the
        # full step and ~0.5^10 backtracks, so any cursor-anchored
        # window is always in the wrong place — solved fraction
        # collapsed from 0.98 to < 0.01. The dense grid is ~1.3 ms of a
        # 7 ms iteration; not the lever.)
        exps = jnp.asarray(exps_t, dtype)
        Zc = jnp.clip(Z[None] + alphas[:, None, None] * p[None], lb, ub)
        cdc, cec, gc = jax.vmap(F.residuals)(Zc)
        costc = jax.vmap(F.cost)(Zc)
        valc = jax.vmap(
            lambda J, a, b, c: F.al_from_parts(
                J, a, b, c, lam_def, lam_eq, mu, rho
            )
        )(costc, cdc, cec, gc)
        decc = jnp.sum(grad[None] * (Zc - Z[None]), axis=(1, 2))
        okc = (
            (valc <= ref + cfg.ls_c1 * decc)
            & jnp.isfinite(valc)
            & (decc < 0.0)
        )
        if cfg.ls_rule == "best":
            # lowest AL among passing candidates (still Armijo-guarded)
            sel = jnp.argmin(jnp.where(okc, valc, jnp.inf))
        else:
            sel = jnp.argmax(okc)  # first passing alpha (first True)
        ls_ok = jnp.any(okc)
        # equivalent sequential-backtrack count (for the lm adaptation
        # thresholds, which were tuned against the halving search) —
        # absolute exponent, so a windowed accept at a small alpha still
        # reads as "deep backtrack" to the damping logic
        nsteps_ls = exps[sel] + 1.0

        move = (~inner_done) & (~done) & ls_ok
        Znew = jnp.where(move, Zc[sel], Z)
        cd_n = jnp.where(move, cdc[sel], cd)
        ce_n = jnp.where(move, cec[sel], ce)
        g_n = jnp.where(move, gc[sel], g)
        cost_n = jnp.where(move, costc[sel], cost)
        val_new = jnp.where(move, valc[sel], val)

        # Levenberg adaptation: full steps -> trust the model more;
        # backtracked or failed steps -> damp harder
        stepping = (~inner_done) & (~done)
        if cfg.lm_rule == "ratio":
            # trust-region flavor: actual vs predicted decrease. Along
            # the (damped-)Newton direction H p = -g the quadratic model
            # predicts -(a g.p + a^2/2 p'Hp) = -g.s (1 - a/2); with the
            # projected step s the first-order term decc[sel] stands in.
            pred = jnp.maximum(-0.5 * decc[sel], 1e-12)
            ratio = (val - val_new) / pred
            lm_step = jnp.where(
                ~ls_ok | bad_dir,
                jnp.minimum(lm * 10.0, cfg.lm_max),
                jnp.where(
                    ratio > 0.75,
                    jnp.maximum(lm * 0.33, cfg.lm_min),
                    jnp.where(
                        ratio < 0.25,
                        jnp.minimum(lm * 3.0, cfg.lm_max), lm
                    ),
                ),
            )
        else:
            lm_step = jnp.where(
                ~ls_ok | bad_dir,
                jnp.minimum(lm * 10.0, cfg.lm_max),
                jnp.where(
                    nsteps_ls <= 1.0,
                    jnp.maximum(lm * 0.33, cfg.lm_min),
                    jnp.where(nsteps_ls > 3.0, lm * 3.0, lm),
                ),
            )
        lm = jnp.where(stepping, lm_step, lm)
        # nonmonotone reference update (Zhang-Hager averaging)
        if cfg.ls_eta > 0.0:
            Qn = cfg.ls_eta * Q + 1.0
            Cn = (cfg.ls_eta * Q * C + val_new) / Qn
            C = jnp.where(stepping, Cn, C)
            Q = jnp.where(stepping, Qn, Q)
        # progress tracking: two consecutive iterations that cannot
        # improve the (reference) AL beyond f32 resolution = this
        # subproblem is at its numerical floor; burning more budget only
        # wastes time. Nonmonotone mode measures against the average C,
        # so an accepted uphill step does not read as a stall.
        improved = (ref - val_new) > cfg.stall_tol * (1.0 + jnp.abs(ref))
        if cfg.ls_deep_round > 0:
            improved = improved & (exps[sel] < cfg.ls_deep_round)
        noprog = jnp.where(
            stepping, jnp.where(improved, 0, noprog + 1), noprog
        )
        in_it = jnp.where(stepping, in_it + 1, in_it)

        # ---- outer (AL round) transition on inner_done lanes ----------
        # (the final, converged round included: the nested formulation
        # returned POST-update multipliers, which is what an MPC re-solve
        # wants as its warm start)
        u = inner_done & (~done_prev)
        drho = cfg.dual_relax * rho
        lam_def = jnp.where(u, lam_def + drho * cd, lam_def)
        lam_eq = jnp.where(u, lam_eq + drho * ce, lam_eq)
        mu = jnp.where(u, jnp.maximum(0.0, mu + drho * g), mu)
        # grow the penalty only while actually infeasible — growing it
        # during the stationarity-polish phase explodes the AL gradient.
        # NOTE on CPU test flakiness: AL from an infeasible guess on a
        # nonconvex field is knife-edge basin-sensitive, and XLA-CPU
        # reduction order varies with machine load, so single-start CPU
        # runs of hard problems are not run-to-run reproducible — use
        # solve_multistart (+ shooting seeds) for those.
        grow = (
            u
            & (viol > cfg.viol_decrease * viol_prev)
            & (viol > cfg.tol_cons)
        )
        rho_new = jnp.where(
            grow, jnp.minimum(rho * cfg.rho_growth, cfg.rho_max), rho
        )
        # LANCELOT omega-schedule: tighten the inner tolerance on good
        # progress, reset against the new penalty on bad progress
        omega = jnp.where(
            u,
            jnp.where(
                grow,
                cfg.inner_tol0 / rho_new,
                jnp.maximum(omega * 0.2, cfg.tol_stat),
            ),
            omega,
        )
        rho = rho_new
        # relax the damping a little at each new outer round so a
        # high-lm episode doesn't slow later (easier) subproblems
        lm = jnp.where(u, jnp.maximum(lm * 0.1, cfg.lm0), lm)
        viol_prev = jnp.where(u, viol, viol_prev)
        o_it = o_it + u.astype(jnp.int32)
        in_it = jnp.where(u, 0, in_it)
        noprog = jnp.where(u, 0, noprog)
        # new round: re-init the nonmonotone reference (the multiplier
        # update moved the AL surface) and the viol-patience baseline
        C = jnp.where(u, jnp.inf, C)
        Q = jnp.where(u, 1.0, Q)
        viol_ref = jnp.where(u, viol, viol_ref)

        new_st = (
            Znew, cd_n, ce_n, g_n, cost_n, lam_def, lam_eq, mu, rho,
            omega, lm, viol_prev, C, Q, viol_ref, Dst, Ost, free_st,
            dmp_st, noprog, in_it, o_it, tot + 1, done, pgn,
        )
        diag = dict(
            val=val, val_new=val_new, pgn=pgn, viol=viol, rho=rho,
            lm=lm, alpha_exp=exps[sel], ls_ok=ls_ok, bad_dir=bad_dir,
            moved=move, round_end=u, done=done,
        )
        return new_st, diag

    def body(st):
        st = body_diag(st)[0]
        # chord (Hessian-reuse) sub-steps: statically unrolled so every
        # lane runs the same program (a traced cond would execute both
        # branches under vmap anyway); each counts against the budgets
        for _ in range(cfg.chord_steps):
            st = body_diag(st, reuse=True)[0]
        return st

    def cond(st):
        (*_, o_it, tot, done, _pgn) = st
        return (~done) & (o_it < cfg.max_outer) & (tot < max_total)

    init = (
        Z0, cd0, ce0, g0, cost0, lam_def0, lam_eq0, mu0, rho0,
        jnp.asarray(cfg.inner_tol0, dtype),
        jnp.asarray(cfg.lm0, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype),  # C (nonmonotone ref; inf = re-init)
        jnp.asarray(1.0, dtype),      # Q (nonmonotone weight)
        jnp.asarray(jnp.inf, dtype),  # viol_ref (patience baseline)
        # chord-step block storage; zero-size placeholders when the
        # feature is off so the baseline while-carry is unchanged
        jnp.zeros((F.K, F.w, F.w) if cfg.chord_steps else (0,), dtype),
        jnp.zeros(
            (F.K - 1, F.w, F.w) if cfg.chord_steps else (0,), dtype
        ),
        jnp.zeros((F.K, F.w) if cfg.chord_steps else (0,), bool),
        jnp.asarray(0.0, dtype),                # dmp_st
        jnp.asarray(0, jnp.int32),   # noprog
        jnp.asarray(0, jnp.int32),   # in_it
        jnp.asarray(0, jnp.int32),   # o_it
        jnp.asarray(0, jnp.int32),   # tot
        jnp.asarray(False),
        jnp.asarray(jnp.inf, dtype),
    )
    if trace_iters:
        # introspection mode: run the SAME body a fixed number of
        # iterations under lax.scan, recording per-iteration diagnostics
        # (the while_loop hides them) — tools/trace_r3.py and the
        # convergence studies drive this
        def scan_body(st, _):
            cont = cond(st)
            new_st, diag = body_diag(st)
            for _ in range(cfg.chord_steps):
                # composite iteration: chord sub-steps ride along (the
                # recorded diagnostics are the full step's)
                new_st = body_diag(new_st, reuse=True)[0]
            new_st = jax.tree.map(
                lambda a, b: jnp.where(cont, a, b), new_st, st
            )
            diag["active"] = cont
            return new_st, diag

        st, hist = lax.scan(scan_body, init, None, length=trace_iters)
    else:
        st = jax.lax.while_loop(cond, body, init)
        hist = None
    (Z, cd, ce, g, cost, lam_def, lam_eq, mu, rho, omega, lm, viol_prev,
     _C, _Q, _viol_ref, _Dst, _Ost, _free_st, _dmp_st,
     noprog, in_it, o_it, tot, done, pgn) = st

    viol_eq = jnp.maximum(
        jnp.max(jnp.abs(cd), initial=0.0),
        jnp.max(jnp.abs(ce), initial=0.0),
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
    result = SolveResult(
        z=z,
        obj=nlp.score(z, data),
        status=status,
        outer_iters=o_it,
        inner_iters=tot,
        viol_eq=viol_eq,
        viol_in=viol_in,
        grad_norm=pgn,
        lam_def=lam_def,
        lam_eq=lam_eq,
        mu=mu,
        rho=rho,
    )
    if trace_iters:
        return result, hist
    return result


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
    K, w = d.nodes, d.node_width
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


@functools.partial(
    jax.jit,
    static_argnums=(0, 1, 4, 5, 6, 8),
    static_argnames=(
        "rescue_lanes", "n_rescue_starts", "rescue_cfg",
        "shooting_samples",
    ),
)
def solve_batched_rescue(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    key: Optional[jax.Array] = None,
    rescue_lanes: int = 0,
    n_rescue_starts: int = 4,
    rescue_cfg: Optional[SolverConfig] = None,
    z0: Optional[jax.Array] = None,
    shooting_samples: int = 256,
    lam0=None,
    rho0: Optional[jax.Array] = None,
) -> SolveResult:
    """Two-phase batched solve: main phase + compacted rescue.

    A vmapped ``while_loop`` runs until its WORST lane finishes, so a
    tail of hard lanes sets the whole fleet's wall clock (measured on
    the N=50 UAS bench: warm re-solves converge at p50 = 10 iterations
    but p99 lanes burn the full budget — warm throughput equaled cold).
    Here phase 1 runs the whole batch under ``cfg`` (use a tight
    ``cfg.max_total``); the ``rescue_lanes`` worst lanes are then
    gathered into a small batch (static shape — pure gather, no host
    sync) and re-solved cold with ``n_rescue_starts``-way multistart +
    shooting seeds under ``rescue_cfg``, and the improved results are
    scattered back. Lanes beyond ``rescue_lanes`` that also failed keep
    their phase-1 status (honest MAX_ITER).

    This is the batched analog of the reference's fallback discipline —
    a failed solve is reported per problem, never fatal (eGLPK.cpp:68) —
    plus the multistart global search the smooth formulation needs on
    nonconvex fields (SURVEY.md §7 hard parts).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    res1 = solve_batched.__wrapped__(nlp, cfg, data, z0, lam0, rho0)
    B = res1.status.shape[0]
    M = rescue_lanes or max(1, B // 8)
    M = min(M, B)
    if rescue_cfg is None:
        rescue_cfg = cfg

    ok = res1.status == jnp.int32(Status.SOLVED)
    # unconverged lanes first (argsort ascending: False < True)
    order = jnp.argsort(ok)
    idx = order[:M]
    sub = jax.tree.map(lambda a: a[idx], data)
    keys = jax.random.split(key, M)
    res2 = jax.vmap(
        lambda d, k: solve_multistart.__wrapped__(
            nlp, rescue_cfg, d, n_rescue_starts, k, 0.4, shooting_samples
        )
    )(sub, keys)

    # adopt the rescue result when it is strictly better: solved where
    # phase 1 was not, or (both unsolved) lower violation
    v1 = jnp.maximum(res1.viol_eq[idx], res1.viol_in[idx])
    v2 = jnp.maximum(res2.viol_eq, res2.viol_in)
    ok1 = ok[idx]
    ok2 = res2.status == jnp.int32(Status.SOLVED)
    better = (ok2 & ~ok1) | (~ok2 & ~ok1 & (v2 < v1))

    def merge(a, b):
        bsel = jnp.where(
            better.reshape((M,) + (1,) * (b.ndim - 1)), b, a[idx]
        )
        return a.at[idx].set(bsel)

    return jax.tree.map(merge, res1, res2)


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 7))
def solve_batched_staged(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    z0: Optional[jax.Array] = None,
    stages=((256, 1024), (64, 2048)),
    lam0=None,
    rho0: Optional[jax.Array] = None,
    return_stage_trips: bool = False,
) -> SolveResult:
    """Compacted multi-phase batched solve.

    A vmapped ``while_loop`` runs until its WORST lane finishes, so the
    tail of the iteration distribution sets the whole fleet's wall clock
    (measured N=50 UAS bench: p50 = 398 Newton iterations, p99 = 1814 —
    a plain batched solve burns > 4x the median's FLOPs on masked
    no-ops). Here phase 1 runs the full batch under ``cfg`` (use a
    moderate ``cfg.max_total``); then each ``(count, budget)`` stage
    gathers the ``count`` worst lanes into a small batch (static shape —
    pure gather, no host sync) and CONTINUES them warm (carried z,
    multipliers and penalty) for ``budget`` more iterations at the small
    batch's much lower per-iteration cost. Improved results scatter
    back; lanes that still fail keep an honest MAX_ITER.

    Use :func:`solve_batched_rescue` when failures are basin problems
    (cold multistart); use this when they are budget problems (the
    measured common case).

    ``return_stage_trips=True`` additionally returns a tuple of scalar
    trip counts — the max executed Newton iterations of phase 1 and of
    each compaction stage — for honest FLOP accounting (a vmapped
    while_loop's wall cost is set by its deepest lane).
    """
    res = solve_batched.__wrapped__(nlp, cfg, data, z0, lam0, rho0)
    stage_trips = [jnp.max(res.inner_iters)]
    for count, budget in stages:
        B = res.status.shape[0]
        M = min(count, B)
        ok = res.status == jnp.int32(Status.SOLVED)
        order = jnp.argsort(ok)  # unconverged lanes first
        idx = order[:M]
        sub = jax.tree.map(lambda a: a[idx], data)
        cfg_i = dataclasses.replace(cfg, max_total=budget)
        lam_i = (res.lam_def[idx], res.lam_eq[idx], res.mu[idx])
        res_i = solve_batched.__wrapped__(
            nlp, cfg_i, sub, res.z[idx], lam_i, res.rho[idx]
        )
        stage_trips.append(jnp.max(res_i.inner_iters))
        v_old = jnp.maximum(res.viol_eq[idx], res.viol_in[idx])
        v_new = jnp.maximum(res_i.viol_eq, res_i.viol_in)
        ok_old = ok[idx]
        ok_new = res_i.status == jnp.int32(Status.SOLVED)
        better = (ok_new & ~ok_old) | (~ok_old & (v_new < v_old))

        def merge(a, b):
            bsel = jnp.where(
                better.reshape((M,) + (1,) * (b.ndim - 1)), b, a[idx]
            )
            return a.at[idx].set(bsel)

        res = jax.tree.map(merge, res, res_i)
    if return_stage_trips:
        return res, tuple(stage_trips)
    return res


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
