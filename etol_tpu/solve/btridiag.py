"""Block-tridiagonal SPD factorization and solves.

The direct-collocation (AL-)Gauss-Newton Hessian in node-major layout is
block tridiagonal: collocation defects couple only adjacent nodes, every
other constraint and the running cost are node-local (cf. the reference's
per-step transcription loops, eGLPK.cpp:279, eGurobi.cpp:238 — the same
structure its MILP matrices have, here exploited instead of handed to a
generic solver). A horizon-K problem with node width w costs O(K w^3)
instead of O((Kw)^3).

Everything is expressed as `lax.scan` over the horizon so a single problem
compiles to a static-shape program and a batch of problems is a plain
`vmap` (→ batched small-matrix ops that XLA lowers to batched GEMMs).

Convention: H[k,k] = D[k] (shape [K, w, w]), H[k, k+1] = O[k]
(shape [K-1, w, w]), H[k+1, k] = O[k]^T.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# TPU MXU note: f32 matmuls default to fast bf16-pass lowering, which is
# fatal for Newton/KKT numerics once the AL penalty is large — every
# contraction on this path pins full-f32 accumulation explicitly.
_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)
_einsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)


# Block widths up to this use fully unrolled closed-form factorizations:
# pure elementwise/VPU ops that vectorize over any leading batch dims —
# far better on TPU than LAPACK-shaped `linalg.cholesky` on tiny blocks.
_UNROLL_W = 8


def _chol_small(A: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky of [..., w, w] for small static w."""
    w = A.shape[-1]
    L = [[None] * w for _ in range(w)]
    zero = jnp.zeros_like(A[..., 0, 0])
    for i in range(w):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else zero for j in range(w)], axis=-1
        )
        for i in range(w)
    ]
    return jnp.stack(rows, axis=-2)


def _tri_solve_small(L, b, trans: bool = False):
    """Unrolled triangular solve: L y = b (or L^T y = b). L is
    [..., w, w] lower; b is [..., w, m]."""
    w = L.shape[-1]
    y = [None] * w
    if not trans:
        for i in range(w):
            s = b[..., i, :]
            for k in range(i):
                s = s - L[..., i, k, None] * y[k]
            y[i] = s / L[..., i, i, None]
    else:
        for i in reversed(range(w)):
            s = b[..., i, :]
            for k in range(i + 1, w):
                s = s - L[..., k, i, None] * y[k]
            y[i] = s / L[..., i, i, None]
    return jnp.stack(y, axis=-2)


def _chol(a: jnp.ndarray) -> jnp.ndarray:
    if a.shape[-1] <= _UNROLL_W:
        return _chol_small(a)
    return jnp.linalg.cholesky(a)


def _tri_solve(L: jnp.ndarray, b: jnp.ndarray, trans: bool = False):
    """Solve L y = b (lower triangular) or L^T y = b when trans."""
    if L.shape[-1] <= _UNROLL_W:
        return _tri_solve_small(L, b, trans)
    return lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=trans
    )


def factor(D: jnp.ndarray, O: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block Cholesky of a block-tridiagonal SPD matrix.

    Returns (L_diag [K, w, w], L_sub [K-1, w, w]) with
    H = L L^T,   L[k,k] = L_diag[k] lower triangular,
    L[k+1,k] = L_sub[k].

    Recurrence: S_0 = D_0; L_k = chol(S_k);
    L_sub[k] = O[k]^T L_k^{-T}; S_{k+1} = D_{k+1} - L_sub[k] L_sub[k]^T.
    """
    K, w, _ = D.shape

    def step(S, inputs):
        Ok, Dk1 = inputs
        Lk = _chol(S)
        # W = L_k^{-1} O_k  => L_sub = W^T
        W = _tri_solve(Lk, Ok)
        S_next = Dk1 - _mm(W.T, W)
        return S_next, (Lk, W.T)

    if K == 1:
        return _chol(D)[None] if D.ndim == 2 else _chol(D), jnp.zeros(
            (0, w, w), D.dtype
        )

    S_last, (L_diag_head, L_sub) = lax.scan(step, D[0], (O, D[1:]))
    L_last = _chol(S_last)
    L_diag = jnp.concatenate([L_diag_head, L_last[None]], axis=0)
    return L_diag, L_sub


def solve_factored(
    L_diag: jnp.ndarray, L_sub: jnp.ndarray, r: jnp.ndarray
) -> jnp.ndarray:
    """Solve H x = r given the block Cholesky factor. r is [K, w]."""
    K, w, _ = L_diag.shape

    # Forward: L y = r;  y_k = L_k^{-1} (r_k - L_sub[k-1] y_{k-1})
    def fwd(y_prev, inputs):
        Lk, Lsub_prev, rk = inputs
        rhs = rk - _mm(Lsub_prev, y_prev)
        yk = _tri_solve(Lk, rhs[:, None])[:, 0]
        return yk, yk

    y0 = _tri_solve(L_diag[0], r[0][:, None])[:, 0]
    if K == 1:
        y = y0[None]
    else:
        _, y_rest = lax.scan(fwd, y0, (L_diag[1:], L_sub, r[1:]))
        y = jnp.concatenate([y0[None], y_rest], axis=0)

    # Backward: L^T x = y;  x_k = L_k^{-T} (y_k - L_sub[k]^T x_{k+1})
    def bwd(x_next, inputs):
        Lk, Lsub_k, yk = inputs
        rhs = yk - _mm(Lsub_k.T, x_next)
        xk = _tri_solve(Lk, rhs[:, None], trans=True)[:, 0]
        return xk, xk

    xK = _tri_solve(L_diag[-1], y[-1][:, None], trans=True)[:, 0]
    if K == 1:
        return xK[None]
    _, x_rest = lax.scan(
        bwd, xK, (L_diag[:-1], L_sub, y[:-1]), reverse=True
    )
    return jnp.concatenate([x_rest, xK[None]], axis=0)


def solve_factored_multi(
    L_diag: jnp.ndarray, L_sub: jnp.ndarray, R: jnp.ndarray
) -> jnp.ndarray:
    """Solve H X = R for a block of right-hand sides. R is [K, w, m]
    (m columns per node). Same sweeps as :func:`solve_factored`."""
    K, w, _ = L_diag.shape

    def fwd(y_prev, inputs):
        Lk, Lsub_prev, rk = inputs
        rhs = rk - _mm(Lsub_prev, y_prev)
        yk = _tri_solve(Lk, rhs)
        return yk, yk

    y0 = _tri_solve(L_diag[0], R[0])
    if K == 1:
        y = y0[None]
    else:
        _, y_rest = lax.scan(fwd, y0, (L_diag[1:], L_sub, R[1:]))
        y = jnp.concatenate([y0[None], y_rest], axis=0)

    def bwd(x_next, inputs):
        Lk, Lsub_k, yk = inputs
        rhs = yk - _mm(Lsub_k.T, x_next)
        xk = _tri_solve(Lk, rhs, trans=True)
        return xk, xk

    xK = _tri_solve(L_diag[-1], y[-1], trans=True)
    if K == 1:
        return xK[None]
    _, x_rest = lax.scan(
        bwd, xK, (L_diag[:-1], L_sub, y[:-1]), reverse=True
    )
    return jnp.concatenate([x_rest, xK[None]], axis=0)


def solve(D: jnp.ndarray, O: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Factor + solve in one call. D [K,w,w], O [K-1,w,w], r [K,w]."""
    L_diag, L_sub = factor(D, O)
    return solve_factored(L_diag, L_sub, r)


def matvec(D: jnp.ndarray, O: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """H x for testing/iterative refinement. x is [K, w]."""
    y = _einsum("kij,kj->ki", D, x)
    if O.shape[0] > 0:
        y = y.at[:-1].add(_einsum("kij,kj->ki", O, x[1:]))
        y = y.at[1:].add(_einsum("kji,kj->ki", O, x[:-1]))
    return y


def to_dense(D: jnp.ndarray, O: jnp.ndarray) -> jnp.ndarray:
    """Assemble the dense [K*w, K*w] matrix (testing only)."""
    K, w, _ = D.shape
    H = jnp.zeros((K * w, K * w), D.dtype)
    for k in range(K):
        H = H.at[k * w : (k + 1) * w, k * w : (k + 1) * w].set(D[k])
    for k in range(K - 1):
        H = H.at[k * w : (k + 1) * w, (k + 1) * w : (k + 2) * w].set(O[k])
        H = H.at[(k + 1) * w : (k + 2) * w, k * w : (k + 1) * w].set(O[k].T)
    return H
