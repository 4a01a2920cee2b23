"""Block cyclic reduction for block-tridiagonal SPD systems.

The sequential block-Cholesky (solve/btridiag.py) runs a `lax.scan` over
the horizon: K dependent steps, each tiny — latency-bound on TPU. Cyclic
reduction eliminates odd-indexed nodes level by level: ceil(log2 K)
levels, each a *parallel* batch of small-matrix operations over the
surviving nodes (cf. the parallel multistage-KKT literature, PAPERS.md —
patterns only). Under `vmap` over the problem batch, every level is a
single batched GEMM bundle.

System convention matches btridiag: H[k,k] = D[k], H[k,k+1] = O[k],
H[k+1,k] = O[k]^T. Stability: intended for the damped AL Hessian
(SPD, near block-diagonally dominant).
"""
from __future__ import annotations

import math
from typing import Tuple

import functools

import jax.numpy as jnp
from jax import lax

from ..solve.btridiag import _chol_small, _tri_solve_small

# full-f32 contraction (TPU f32 matmuls default to bf16 passes)
_einsum = functools.partial(jnp.einsum, precision=lax.Precision.HIGHEST)


def _inv_apply(Dk: jnp.ndarray, *rhs: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Solve D y = rhs for each rhs ([..., w, m]) via unrolled Cholesky."""
    L = _chol_small(Dk)
    outs = []
    for b in rhs:
        y = _tri_solve_small(L, b)
        outs.append(_tri_solve_small(L, y, trans=True))
    return tuple(outs)


def solve(D: jnp.ndarray, O: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = r. D [K, w, w], O [K-1, w, w], r [K, w] -> x [K, w].

    Pads the node count to M = 2^m - 1 with decoupled identity rows.
    Python-level loop over the (static) log-depth levels; every level's
    work is batched over nodes.
    """
    K, w, _ = D.shape
    dtype = D.dtype
    m = max(1, math.ceil(math.log2(K + 1)))
    M = 2**m - 1

    eye = jnp.broadcast_to(jnp.eye(w, dtype=dtype), (M - K, w, w))
    Dp = jnp.concatenate([D, eye], axis=0) if M > K else D
    Zo = jnp.zeros((M - 1 - O.shape[0], w, w), dtype)
    Op = jnp.concatenate([O, Zo], axis=0) if M - 1 > O.shape[0] else O
    rp = (
        jnp.concatenate([r, jnp.zeros((M - K, w), dtype)], axis=0)
        if M > K
        else r
    )

    # level arrays: lower couplings L_i = O[i-1]^T (i>0), upper U_i = O[i]
    # represent per-node: L [n, w, w] (L_0 = 0), U [n, w, w] (U_last = 0)
    zero = jnp.zeros((1, w, w), dtype)
    L = jnp.concatenate([zero, jnp.transpose(Op, (0, 2, 1))], axis=0)
    U = jnp.concatenate([Op, zero], axis=0)

    # -------- forward elimination --------
    stack = []  # per level: (D_odd, L_odd, U_odd, r_odd) for back-subst
    Dc, Lc, Uc, rc = Dp, L, U, rp
    n = M
    while n > 1:
        Do, Lo, Uo, ro = Dc[1::2], Lc[1::2], Uc[1::2], rc[1::2]  # odd
        De, Le, Ue, re = Dc[0::2], Lc[0::2], Uc[0::2], rc[0::2]  # even
        stack.append((Do, Lo, Uo, ro))

        # for each odd node j (between evens j-1, j+1):
        # X = D_j^{-1} [L_j | U_j | r_j]
        XL, XU, Xr = _inv_apply(Do, Lo, Uo, ro[..., None])
        Xr = Xr[..., 0]

        ne = De.shape[0]
        # even i gains from its right odd neighbor (odd index i) when it
        # exists, and from its left odd neighbor (odd index i-1)
        # right neighbor odd j = i (for i < n_odd): contributes via U_e
        has_r = jnp.arange(ne) < Do.shape[0]
        has_l = jnp.arange(ne) > 0

        # pad odd arrays for aligned gathers
        def pad0(a):
            return jnp.concatenate(
                [a, jnp.zeros((1,) + a.shape[1:], dtype)], axis=0
            )

        XLr, XUr, Xrr = XL, XU, Xr  # right neighbor arrays, index i
        XLl = jnp.concatenate([jnp.zeros_like(XL[:1]), XL], axis=0)
        XUl = jnp.concatenate([jnp.zeros_like(XU[:1]), XU], axis=0)
        Xrl = jnp.concatenate([jnp.zeros_like(Xr[:1]), Xr], axis=0)
        XLr, XUr, Xrr = pad0(XL), pad0(XU), pad0(Xr)

        mr = has_r[:, None, None].astype(dtype)
        ml = has_l[:, None, None].astype(dtype)

        D_new = (
            De
            - mr * _einsum("nij,njk->nik", Ue, XLr[:ne])
            - ml * _einsum("nij,njk->nik", Le, XUl[:ne])
        )
        U_new = -mr * _einsum("nij,njk->nik", Ue, XUr[:ne])
        L_new = -ml * _einsum("nij,njk->nik", Le, XLl[:ne])
        r_new = (
            re
            - mr[..., 0] * _einsum("nij,nj->ni", Ue, Xrr[:ne])
            - ml[..., 0] * _einsum("nij,nj->ni", Le, Xrl[:ne])
        )
        Dc, Lc, Uc, rc = D_new, L_new, U_new, r_new
        n = ne

    # single remaining node
    (x0,) = _inv_apply(Dc[0], rc[0][..., None])
    xs = x0[..., 0][None]

    # -------- back substitution --------
    for Do, Lo, Uo, ro in reversed(stack):
        no = Do.shape[0]
        ne = xs.shape[0]
        # odd j sits between even j (left) and even j+1 (right)
        xl = xs[:no]
        xr_exists = jnp.arange(no) + 1 < ne
        xr = jnp.concatenate([xs[1:], jnp.zeros((1, w), dtype)], axis=0)[
            :no
        ]
        rhs = (
            ro
            - _einsum("nij,nj->ni", Lo, xl)
            - xr_exists[:, None].astype(dtype)
            * _einsum("nij,nj->ni", Uo, xr)
        )
        (xo,) = _inv_apply(Do, rhs[..., None])
        xo = xo[..., 0]
        # interleave evens and odds back: [e0, o0, e1, o1, ...]
        total = ne + no
        out = jnp.zeros((total, w), dtype)
        out = out.at[0::2].set(xs)
        out = out.at[1::2].set(xo)
        xs = out

    return xs[:K]
