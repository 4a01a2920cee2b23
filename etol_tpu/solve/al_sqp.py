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
    tol_cons: float = 1e-5      # constraint violation inf-norm
    rho0: float = 10.0          # initial AL penalty
    rho_growth: float = 5.0
    rho_max: float = 1e7
    viol_decrease: float = 0.5  # required viol reduction else rho grows
    reg: float = 1e-6           # Levenberg diagonal regularization
    ls_backtracks: int = 16
    ls_c1: float = 1e-4
    inner_tol0: float = 1e-2    # LANCELOT-style: inner tol tightens with rho


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


def _solve_single(nlp: NLP, cfg: SolverConfig, data: VGPData, z0, lam0):
    d = nlp.dims
    K, w = d.nodes, d.nx + d.nu
    dtype = data.x0.dtype
    lam_def0, lam_eq0, mu0 = lam0

    lb, ub = nlp.bounds(data)
    lb = lb.reshape(K, w)
    ub = ub.reshape(K, w)
    Z0 = jnp.clip(z0.reshape(K, w), lb, ub)
    ks_step = jnp.arange(d.nsteps)
    ks_node = jnp.arange(K)
    pinned = (ub - lb) <= 1e-12

    def residuals(Z):
        c_def = jax.vmap(
            lambda a, b, k: nlp.step_defect(a, b, k, data)
        )(Z[:-1], Z[1:], ks_step)
        c_eq = jax.vmap(lambda zn, k: nlp.node_eq(zn, k, data))(Z, ks_node)
        g = jax.vmap(lambda zn, k: nlp.node_ineq(zn, k, data))(Z, ks_node)
        return c_def, c_eq, g

    def cost(Z):
        return jnp.sum(
            jax.vmap(lambda zn, k: nlp.node_cost(zn, k, data))(Z, ks_node)
        )

    def al_value(Z, lam_def, lam_eq, mu, rho):
        c_def, c_eq, g = residuals(Z)
        J = cost(Z)
        J = J + jnp.sum(lam_def * c_def) + 0.5 * rho * jnp.sum(c_def**2)
        J = J + jnp.sum(lam_eq * c_eq) + 0.5 * rho * jnp.sum(c_eq**2)
        s = jnp.maximum(0.0, mu + rho * g)
        J = J + (0.5 / rho) * jnp.sum(s * s - mu * mu)
        return J

    al_grad = jax.grad(al_value)

    # ---- Gauss-Newton block Hessian of the AL -------------------------
    def gn_blocks(Z, mu, rho, free):
        # node-local curvature: cost Hessian + rho * (Ge^T Ge + Gi^T W Gi)
        def node_blocks(zn, k, mu_k):
            Hl = jax.hessian(lambda v: nlp.node_cost(v, k, data))(zn)
            De = jnp.zeros((w, w), dtype)
            Ge = jax.jacfwd(lambda v: nlp.node_eq(v, k, data))(zn)
            if Ge.shape[0]:  # static: skip when the problem has none
                De = De + Ge.T @ Ge
            Gi = jax.jacfwd(lambda v: nlp.node_ineq(v, k, data))(zn)
            if Gi.shape[0]:
                g_k = nlp.node_ineq(zn, k, data)
                act = (mu_k + rho * g_k > 0).astype(dtype)
                De = De + (Gi * act[:, None]).T @ Gi
            return Hl + rho * De

        D = jax.vmap(node_blocks)(Z, ks_node, mu)

        # step coupling: defect Jacobians A_k = dc/dz_k, B_k = dc/dz_{k+1}
        def step_jacs(a, b, k):
            A = jax.jacfwd(lambda v: nlp.step_defect(v, b, k, data))(a)
            B = jax.jacfwd(lambda v: nlp.step_defect(a, v, k, data))(b)
            return A, B

        A, B = jax.vmap(step_jacs)(Z[:-1], Z[1:], ks_step)
        D = D.at[:-1].add(rho * jnp.einsum("kij,kil->kjl", A, A))
        D = D.at[1:].add(rho * jnp.einsum("kij,kil->kjl", B, B))
        O = rho * jnp.einsum("kij,kil->kjl", A, B)

        # active-set masking: fixed rows/cols become identity
        m = free.astype(dtype)
        D = D * (m[:, :, None] * m[:, None, :])
        D = D + jnp.eye(w, dtype=dtype) * (1.0 - m)[:, None, :]
        O = O * (m[:-1][:, :, None] * m[1:][:, None, :])
        # Levenberg regularization keeps the factor SPD in f32
        D = D + (cfg.reg * (1.0 + rho)) * jnp.eye(w, dtype=dtype)
        return D, O

    def proj_grad_norm(Z, grad):
        pg = Z - jnp.clip(Z - grad, lb, ub)
        return jnp.max(jnp.abs(pg))

    # ---- inner projected-Newton loop ----------------------------------
    def inner_solve(Z, lam_def, lam_eq, mu, rho, tol_inner):
        def body(state):
            Z, it, _ = state
            grad = al_grad(Z, lam_def, lam_eq, mu, rho)
            at_lb = Z <= lb + 1e-9
            at_ub = Z >= ub - 1e-9
            free = ~(
                pinned
                | (at_lb & (grad > 0.0))
                | (at_ub & (grad < 0.0))
            )
            D, O = gn_blocks(Z, mu, rho, free)
            rhs = jnp.where(free, -grad, 0.0)
            p = btridiag.solve(D, O, rhs)
            # fall back to (projected) steepest descent if the factor
            # failed (NaNs) or the direction is not descent
            bad = ~jnp.all(jnp.isfinite(p)) | (jnp.sum(p * grad) >= 0.0)
            p = jnp.where(bad, rhs, p)

            # projected backtracking Armijo line search
            val0 = al_value(Z, lam_def, lam_eq, mu, rho)

            def ls_body(ls_state):
                j, _, _, _ = ls_state
                alpha = 0.5**j
                Znew = jnp.clip(Z + alpha * p, lb, ub)
                val = al_value(Znew, lam_def, lam_eq, mu, rho)
                dec = jnp.sum(grad * (Znew - Z))
                ok = val <= val0 + cfg.ls_c1 * dec
                ok = ok & jnp.isfinite(val) & (dec < 0.0)
                return j + 1.0, ok, Znew, val

            def ls_cond(ls_state):
                j, ok, _, _ = ls_state
                return (~ok) & (j < cfg.ls_backtracks)

            _, ls_ok, Zc, _ = jax.lax.while_loop(
                ls_cond,
                ls_body,
                (jnp.asarray(0.0, dtype), jnp.asarray(False), Z, val0),
            )
            Znew = jnp.where(ls_ok, Zc, Z)
            pgn = proj_grad_norm(
                Znew, al_grad(Znew, lam_def, lam_eq, mu, rho)
            )
            done = (pgn <= tol_inner) | (~ls_ok)
            return Znew, it + 1, done

        def cond(state):
            _, it, done = state
            return (~done) & (it < cfg.max_inner)

        Z, it, _ = jax.lax.while_loop(
            cond, body, (Z, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        )
        return Z, it

    # ---- outer AL loop ------------------------------------------------
    def outer_body(state):
        (Z, lam_def, lam_eq, mu, rho, omega, viol_prev, o_it, i_tot,
         _, _) = state
        tol_inner = jnp.maximum(cfg.tol_stat, omega)
        Z, it = inner_solve(Z, lam_def, lam_eq, mu, rho, tol_inner)
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
        done = (viol <= cfg.tol_cons) & (pgn <= cfg.tol_stat)
        # first-order multiplier update
        lam_def = lam_def + rho * c_def
        lam_eq = lam_eq + rho * c_eq
        mu = jnp.maximum(0.0, mu + rho * g)
        # grow the penalty only while actually infeasible — growing it
        # during the stationarity-polish phase explodes the AL gradient
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
            grow, cfg.inner_tol0 / rho, jnp.maximum(
                omega * 0.2, cfg.tol_stat
            )
        )
        return (
            Z, lam_def, lam_eq, mu, rho, omega, viol, o_it + 1,
            i_tot + it, done, pgn,
        )

    def outer_cond(state):
        *_, o_it, _, done, _pgn = state
        return (~done) & (o_it < cfg.max_outer)

    rho0 = jnp.asarray(cfg.rho0, dtype)
    init = (
        Z0,
        lam_def0,
        lam_eq0,
        mu0,
        rho0,
        jnp.asarray(cfg.inner_tol0, dtype),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, dtype),
    )
    Z, lam_def, lam_eq, mu, rho, omega, viol, o_it, i_tot, done, pgn = (
        jax.lax.while_loop(outer_cond, outer_body, init)
    )

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
) -> SolveResult:
    """Solve one VGP. ``z0``/``lam0`` warm-start (MPC fast path)."""
    if z0 is None:
        z0 = nlp.initial_guess(data)
    if lam0 is None:
        lam0 = init_multipliers(nlp, data)
    return _solve_single(nlp, cfg, data, z0, lam0)


@functools.partial(jax.jit, static_argnums=(0, 1))
def solve_batched(
    nlp: NLP,
    cfg: SolverConfig,
    data: VGPData,
    z0: Optional[jax.Array] = None,
    lam0=None,
) -> SolveResult:
    """Solve a batch: every leaf of ``data`` has a leading batch axis.

    ``vmap`` over lanes — diverged lanes carry their own status instead of
    poisoning the batch.
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
    return jax.vmap(
        lambda dat, z, l: _solve_single(nlp, cfg, dat, z, l)
    )(data, z0, lam0)
