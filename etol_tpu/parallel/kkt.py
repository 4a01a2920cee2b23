"""Horizon-sharded block-tridiagonal KKT solve (distributed direct solve).

The collocation Gauss-Newton Hessian is block tridiagonal over the node
axis (solve/btridiag.py). For horizons too long for one device — or to
cut the O(K) sequential factorization latency — the node axis shards
over a mesh axis and the solve runs as a SPIKE / Schur-complement
partitioned elimination (cf. the multistage-KKT literature, PAPERS.md —
patterns only; SURVEY.md §5 "shard the collocation/time axis;
psum-reduced Schur complements"):

1. **Local interior elimination.** Each shard owns a contiguous slab of
   ``kb`` nodes; its last node is a *separator*. The shard factors its
   interior chain (kb-1 nodes, sequential block Cholesky — the only
   O(kb) work) and solves it against the interior rhs and the two
   boundary coupling columns.
2. **Separator system.** Eliminating all interiors leaves a
   block-tridiagonal system over the n separators ([n, w] — tiny). Each
   shard's contributions are `psum`-reduced over the mesh axis (one
   all-reduce of a few KB over ICI) and every shard solves the reduced
   system redundantly.
3. **Local back-substitution.** x_interior = M^{-1}(r - A s_left
   - B s_right), already available from step 1's multi-rhs solve.

Communication: one `ppermute` halo (the coupling block O[s_{d-1}] from
the left neighbor) + one `psum` of the [n, w, w] separator system. Both
ride ICI when the horizon axis maps to a pod dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..solve import btridiag

_mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


def _solve_local(D_loc, O_loc, r_loc, halo_O, axis: str):
    """Shard-local body (call inside shard_map).

    D_loc [kb, w, w], O_loc [kb, w, w] (row k couples global node k to
    k+1; the global last row is padding), r_loc [kb, w], halo_O [w, w] =
    O[s_{d-1}] from the left neighbor (zeros on shard 0).
    Returns x_loc [kb, w].
    """
    kb, w, _ = D_loc.shape
    if kb < 2:
        raise ValueError("horizon-sharded KKT needs >= 2 nodes per shard")
    n = lax.psum(1, axis)
    d = lax.axis_index(axis)
    dtype = D_loc.dtype
    m = kb - 1  # interior chain length

    # interior chain: local nodes 0..kb-2; separator: local node kb-1
    Di = D_loc[:m]
    Oi = O_loc[: m - 1] if m > 1 else jnp.zeros((0, w, w), dtype)
    A_blk = jnp.transpose(halo_O)       # H[first interior, s_left]
    A_blk = jnp.where(d > 0, A_blk, jnp.zeros_like(A_blk))
    B_blk = O_loc[m - 1]                # H[last interior, own separator]

    # multi-rhs interior solve: [r | A cols | B cols]
    R = jnp.zeros((m, w, 2 * w + 1), dtype)
    R = R.at[:, :, 0].set(r_loc[:m])
    R = R.at[0, :, 1 : w + 1].set(A_blk)
    R = R.at[m - 1, :, w + 1 :].set(B_blk)
    Ld, Ls = btridiag.factor(Di, Oi)
    X = btridiag.solve_factored_multi(Ld, Ls, R)
    Xr = X[:, :, 0]                     # [m, w]
    XA = X[:, :, 1 : w + 1]             # [m, w, w]
    XB = X[:, :, w + 1 :]               # [m, w, w]

    # Schur contributions (A has its only block at interior row 0, B at
    # row m-1, so the products collapse to single-block matmuls)
    diag_own = D_loc[m] - _mm(B_blk.T, XB[m - 1])
    rhs_own = r_loc[m] - B_blk.T @ Xr[m - 1]
    diag_left = -_mm(A_blk.T, XA[0])
    rhs_left = -(A_blk.T @ Xr[0])
    off_left = -_mm(A_blk.T, XB[0])     # couples s_{d-1} to s_d

    # assemble the [n, w, w] separator system by psum of scattered rows
    Sdiag = jnp.zeros((n, w, w), dtype).at[d].set(diag_own)
    Sdiag = Sdiag.at[jnp.maximum(d - 1, 0)].add(
        jnp.where(d > 0, diag_left, jnp.zeros_like(diag_left))
    )
    Soff = jnp.zeros((n, w, w), dtype).at[jnp.maximum(d - 1, 0)].add(
        jnp.where(d > 0, off_left, jnp.zeros_like(off_left))
    )
    rr = jnp.zeros((n, w), dtype).at[d].set(rhs_own)
    rr = rr.at[jnp.maximum(d - 1, 0)].add(
        jnp.where(d > 0, rhs_left, jnp.zeros_like(rhs_left))
    )
    Sdiag = lax.psum(Sdiag, axis)
    Soff = lax.psum(Soff, axis)[: n - 1] if n > 1 else jnp.zeros(
        (0, w, w), dtype
    )
    rr = lax.psum(rr, axis)

    # redundant tiny solve of the separator system on every shard
    s = btridiag.solve(Sdiag, Soff, rr)  # [n, w]

    s_left = jnp.where(d > 0, s[jnp.maximum(d - 1, 0)], jnp.zeros((w,), dtype))
    s_own = s[d]
    x_int = (
        Xr
        - jnp.einsum("mwv,v->mw", XA, s_left)
        - jnp.einsum("mwv,v->mw", XB, s_own)
    )
    return jnp.concatenate([x_int, s_own[None]], axis=0)


def halo_left_O(O_loc, axis: str):
    """Each shard's view of the LEFT neighbor's last coupling row
    O[s_{d-1}] ([w, w]; garbage on shard 0 — masked in _solve_local)."""
    n = lax.psum(1, axis)
    perm = [(i, (i + 1) % n) for i in range(n)]  # send right
    return lax.ppermute(O_loc[-1], axis, perm)


def sharded_solve(D_loc, O_loc, r_loc, axis: str):
    """shard_map-internal entry: local slabs in, local solution out."""
    halo = halo_left_O(O_loc, axis)
    return _solve_local(D_loc, O_loc, r_loc, halo, axis)


def make_solver(mesh: Mesh, axis: str = "horizon"):
    """Build ``f(D, O, r) -> x`` over GLOBAL arrays with the node axis
    sharded over ``mesh[axis]``. D [K, w, w], O [K-1, w, w] (padded to K
    internally), r [K, w]; K % mesh.shape[axis] == 0."""

    def global_solve(D, O, r):
        K = D.shape[0]
        w = D.shape[-1]
        Opad = jnp.concatenate(
            [O, jnp.zeros((K - O.shape[0], w, w), O.dtype)], axis=0
        )
        f = shard_map(
            lambda d, o, rr: sharded_solve(d, o, rr, axis),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        return f(D, Opad, r)

    return global_solve
