"""Pallas TPU kernel: batched block-tridiagonal Cholesky solve.

Layout rethink for the TPU memory model: the XLA path (`vmap` of
solve/btridiag.py) carries each problem's tiny w x w matrices in the
minor dims — batched small-matrix ops. This kernel instead puts the
PROBLEM BATCH on the 128-lane axis and the (static, small) block
structure in registers: every Cholesky/substitution scalar becomes a
[BT]-wide VPU op, the K-recurrence runs once per grid cell for BT
problems, and all factor state stays in VMEM scratch (no HBM traffic
between factor and substitution).

v2 (round 2):
* **In-kernel iterative refinement**: the solver needs one refinement
  pass for f32 accuracy at high AL penalty. v1 refactorized for the
  second solve (2 full kernel calls + an XLA matvec); now the kernel
  computes the residual r - Hx with full-slab VPU ops and re-runs only
  the two substitution sweeps against the stored factor — ~1.2x the
  cost of a single solve instead of 2x.
* **No lax.cond in the sweeps**: first/last nodes are peeled, so every
  fori_loop body is straight-line vector code.
* **Triangular-packed factor storage** (w(w+1)/2 rows instead of w^2)
  and a lane tile of 256 when the batch allows — [8, 128]-shaped rows
  fill the VPU's sublanes instead of 1/8 of them.

Shapes (wrapper transposes): D [K, w*w, B], O [K-1, w*w, B],
r [K, w, B] -> x [K, w, B], grid over B/BT lane tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# scoped-VMEM budget per grid cell. Mosaic's stack accounting runs ~3x
# the raw ref/scratch footprint; solve_lanes raises the Mosaic limit to
# 100MB via CompilerParams(vmem_limit_bytes), so the guard/picker cap is
# 100/3 ~ 30MB (was 10MB against the ~16MB default limit — r1's worker
# crash at bt=256+refine came from exceeding the DEFAULT limit)
_VMEM_CAP = 30 * 1024 * 1024  # bytes per grid cell


def _tri(i: int, j: int) -> int:
    """Row index of L[i][j] (j <= i) in triangular-packed storage."""
    return i * (i + 1) // 2 + j


def _bt_kernel(K: int, w: int, refine: int):
    w2 = w * w
    tw = w * (w + 1) // 2

    def kernel(d_ref, o_ref, r_ref, x_ref, lfac_ref, lsub_ref, y_ref,
               c_ref):
        def chol_rows(slab):
            # slab [w2, BT] rows = matrix entries (i*w+j); returns the
            # lower factor as a python [i][j] list of [BT] rows
            L = [[None] * w for _ in range(w)]
            for i in range(w):
                for j in range(i + 1):
                    s = slab[i * w + j, :]
                    for t in range(j):
                        s = s - L[i][t] * L[j][t]
                    if i == j:
                        L[i][j] = jnp.sqrt(s)
                    else:
                        L[i][j] = s / L[j][j]
            return L

        def fwd_subst(L, b_rows):
            # solve L y = b for w-vector rows [each [BT]]
            y = [None] * w
            for i in range(w):
                s = b_rows[i]
                for t in range(i):
                    s = s - L[i][t] * y[t]
                y[i] = s / L[i][i]
            return y

        def bwd_subst(L, b_rows):
            x = [None] * w
            for i in reversed(range(w)):
                s = b_rows[i]
                for t in range(i + 1, w):
                    s = s - L[t][i] * x[t]
                x[i] = s / L[i][i]
            return x

        def store_L(k, L):
            rows = []
            for i in range(w):
                for j in range(i + 1):
                    rows.append(L[i][j])
            lfac_ref[k] = jnp.stack(rows, axis=0)

        def load_L(k):
            slab = lfac_ref[k]
            return [
                [slab[_tri(i, j), :] for j in range(i + 1)]
                for i in range(w)
            ]

        def factor_node(k, S, rhs_prev_rows):
            """chol S, fwd-subst this node's rhs; returns (L, y_rows)."""
            L = chol_rows(S)
            store_L(k, L)
            yk = fwd_subst(L, rhs_prev_rows)
            y_ref[k] = jnp.stack(yk, axis=0)
            return L, yk

        def coupled_rhs(ref, k):
            """rhs_k = ref[k] - Lsub_{k-1} y_{k-1} (reads solved y)."""
            prev = [y_ref[k - 1, i, :] for i in range(w)]
            ls = lsub_ref[k - 1]
            out = []
            for i in range(w):
                s = ref[k, i, :]
                for j in range(w):
                    s = s - ls[i * w + j, :] * prev[j]
                out.append(s)
            return out

        def schur_next(k, L):
            """W = L^{-1} O_k; store Lsub_k = W^T; return S_{k+1}."""
            ok = o_ref[k]
            Wcols = []
            for c in range(w):
                col = [ok[i * w + c, :] for i in range(w)]
                Wcols.append(fwd_subst(L, col))  # W[:, c]
            rows = []
            for i in range(w):
                for j in range(w):
                    rows.append(Wcols[i][j])  # Lsub[i][j] = W[j][i]^T dance
            lsub_ref[k] = jnp.stack(rows, axis=0)
            dn = d_ref[k + 1]
            rows_s = []
            for i in range(w):
                for j in range(w):
                    s = dn[i * w + j, :]
                    for t in range(w):
                        s = s - Wcols[i][t] * Wcols[j][t]
                    rows_s.append(s)
            return jnp.stack(rows_s, axis=0)

        # ---- factor + forward substitution (rhs = r) -----------------
        L0, _ = factor_node(0, d_ref[0], [r_ref[0, i, :] for i in range(w)])
        if K > 1:
            S1 = schur_next(0, L0)

            def body_fwd(k, S):
                L, _ = factor_node(k, S, coupled_rhs(r_ref, k))
                return schur_next(k, L)

            S_last = jax.lax.fori_loop(1, K - 1, body_fwd, S1)
            factor_node(K - 1, S_last, coupled_rhs(r_ref, K - 1))

        # ---- backward substitution into x ----------------------------
        def bwd_sweep(out_ref):
            """L^T sweep: out_ref[k] = bwd-subst using y_ref and the
            downstream out_ref[k+1] coupling."""
            L = load_L(K - 1)
            xk = bwd_subst(L, [y_ref[K - 1, t, :] for t in range(w)])
            out_ref[K - 1] = jnp.stack(xk, axis=0)

            def body_bwd(i, _):
                k = K - 2 - i
                L = load_L(k)
                nxt = [out_ref[k + 1, t, :] for t in range(w)]
                ls = lsub_ref[k]
                rhs = []
                for t in range(w):
                    s = y_ref[k, t, :]
                    for j in range(w):
                        # x_k = L^{-T}(y_k - Lsub_k^T x_{k+1})
                        s = s - ls[j * w + t, :] * nxt[j]
                    rhs.append(s)
                xk = bwd_subst(L, rhs)
                out_ref[k] = jnp.stack(xk, axis=0)
                return 0

            if K > 1:
                jax.lax.fori_loop(0, K - 1, body_bwd, 0)

        bwd_sweep(x_ref)

        # ---- iterative refinement (reuses the stored factor) ---------
        for _ in range(refine):
            # residual res = r - H x with full-slab VPU ops:
            # res_i = r_i - D x - O x_next - O_prev^T x_prev.
            # Rows are sliced straight off the VMEM refs ([K, BT] slabs)
            # — materializing whole [K, w^2, BT] values blows the
            # scoped-vmem stack at wide lane tiles.
            X = x_ref[:]                                        # [K, w, BT]
            zrow = jnp.zeros_like(X[:1])
            Xn = jnp.concatenate([X[1:], zrow], axis=0)
            Xp = jnp.concatenate([zrow, X[:-1]], axis=0)
            rows = []
            for i in range(w):
                s = r_ref[:, i, :]
                for j in range(w):
                    s = s - d_ref[:, i * w + j, :] * X[:, j, :]
                    s = s - o_ref[:, i * w + j, :] * Xn[:, j, :]
                    opj = o_ref[:, j * w + i, :]
                    op_prev = jnp.concatenate(
                        [jnp.zeros_like(opj[:1]), opj[:-1]], axis=0
                    )
                    s = s - op_prev * Xp[:, j, :]
                rows.append(s)
            res = jnp.stack(rows, axis=1)                       # [K, w, BT]

            # two substitution sweeps against the stored factor; the
            # forward sweep streams through y_ref (overwriting the
            # first pass's y, which is no longer needed)
            L = load_L(0)
            y_ref[0] = jnp.stack(
                fwd_subst(L, [res[0, i, :] for i in range(w)]), axis=0
            )
            # res lives in registers; stage it via c_ref so the coupled
            # forward sweep can read it by dynamic index
            c_ref[:] = res

            def body_fwd2(k, _):
                L = load_L(k)
                yk = fwd_subst(L, coupled_rhs(c_ref, k))
                y_ref[k] = jnp.stack(yk, axis=0)
                return 0

            if K > 1:
                jax.lax.fori_loop(1, K, body_fwd2, 0)
            bwd_sweep(c_ref)
            x_ref[:] = x_ref[:] + c_ref[:]

    return kernel


def _vmem_bytes(K, w, bt, refine=1):
    tw = w * (w + 1) // 2
    # in: D w2 + O w2 + r w; out: x w; scratch: lfac tw + lsub w2 + y w
    # + c w (refinement)
    rows = 3 * w * w + tw + (4 if refine else 3) * w
    return rows * K * bt * 4


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def solve_lanes(D, O, r, interpret: bool = False, refine: int = 1,
                block: int = 0):
    """Batched solve, lane-major kernel. D [B, K, w, w], O [B, K-1, w, w],
    r [B, K, w] -> x [B, K, w]. B must be a multiple of the lane tile
    (pad); ``refine`` in-kernel refinement passes reuse the factor.

    ROOT CAUSE of the round-1 ``bench_err.log`` TPU-worker crash: lane
    tiles wider than 128 with ``refine > 0`` overflow Mosaic's scoped
    VMEM (its stack accounting runs ~3x the raw ref/scratch footprint —
    the refinement pass materializes full [K, w, BT] slabs on top of the
    factor scratch). bt=256 + refine=1 reproducibly fails remote
    compilation (HTTP 500 from tpu_compile_helper) and previously could
    crash the worker at run time. The guard below fails fast with a
    clear error instead; :func:`pick_block` never selects such a tile.
    """
    B, K, w, _ = D.shape
    bt = block or LANES
    assert B % bt == 0, f"batch {B} must be a multiple of {bt}"
    if refine and bt > LANES and 3 * _vmem_bytes(K, w, bt) > _VMEM_CAP:
        raise ValueError(
            f"lane tile {bt} with refine={refine} exceeds Mosaic scoped "
            f"VMEM at K={K}, w={w} (measured ~3x accounting factor); "
            "use bt=128 or refine=0 — see pick_block()"
        )
    Dt = D.reshape(B, K, w * w).transpose(1, 2, 0)      # [K, w2, B]
    Zo = jnp.zeros((B, 1, w, w), D.dtype)
    Opad = jnp.concatenate([O, Zo], axis=1)             # [B, K, w, w]
    Ot = Opad.reshape(B, K, w * w).transpose(1, 2, 0)
    rt = r.transpose(1, 2, 0)                           # [K, w, B]

    tw = w * (w + 1) // 2
    grid = (B // bt,)
    out = pl.pallas_call(
        _bt_kernel(K, w, refine),
        out_shape=jax.ShapeDtypeStruct((K, w, B), D.dtype),
        grid=grid,
        # raise Mosaic's scoped-VMEM limit (default ~16MB of the chip's
        # 128MB): wide lane tiles with in-kernel refinement are VMEM-
        # hungry (~3x the raw footprint in scoped accounting) but cut
        # the sequential grid-cell count 2-4x
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        in_specs=[
            pl.BlockSpec(
                (K, w * w, bt), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, w * w, bt), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, w, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (K, w, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((K, tw, bt), D.dtype),    # packed Cholesky diag
            pltpu.VMEM((K, w * w, bt), D.dtype),  # subdiagonal factor
            pltpu.VMEM((K, w, bt), D.dtype),      # forward-sweep y
            pltpu.VMEM((K, w, bt), D.dtype),      # refinement correction
        ],
        interpret=interpret,
    )(Dt, Ot, rt)
    return out.transpose(2, 0, 1)  # [B, K, w]


def usable(K: int, w: int) -> bool:
    # w cap bounds the unrolled triangle (tw = w(w+1)/2 sequential rows
    # per node). w=9 measured on v5e at K=101, B=256 (the fixed-wing
    # N=100 shape, tools/kkt_kernel_bench.py): 1.03 ms/solve at
    # bt=128+refine1, resid 2.4e-6 — flipping fw100 from the cyclic-
    # reduction fallback to this kernel took the ladder rung 151 -> see
    # README. Wider than 9 is untested against Mosaic's unroll budget.
    return w <= 9 and _vmem_bytes(K, w, LANES) <= _VMEM_CAP


def pick_block(B: int, K: int, w: int) -> int:
    """Lane tile choice. MEASURED on v5e (tools/kkt_kernel_bench.py,
    B=1024 K=51 w=5, timed inside a jitted loop): bt=128+refine1 runs
    0.51 ms/solve vs 0.70 ms at bt=256 — one [8,128] register of lanes
    is the sweet spot; wider tiles spill VMEM traffic without cutting
    the sequential K-recurrence. Keep 128 unless the batch doesn't
    reach it."""
    return LANES if B % LANES == 0 else max(
        bt for bt in (1, 2, 4, 8, 16, 32, 64) if B % bt == 0
    )


# ---------------------------------------------------------------------------
# vmap-aware single-problem entry point: lets the per-lane solver code
# (al_sqp direction) transparently hit the lane-major kernel when the
# whole solve is vmapped over a batch. Unbatched calls fall back to
# cyclic reduction. (Measured on v5e, B=1024 K=51 w=5: scan 59ms,
# cyclic reduction 6.2ms, v1 kernel 3.1ms per batched solve; v2 fuses
# the refinement pass on top.)
# ---------------------------------------------------------------------------
from jax.custom_batching import custom_vmap  # noqa: E402

from ..solve import btridiag as _btridiag  # noqa: E402


@custom_vmap
def solve_auto(D, O, r):
    """Solve one block-tridiagonal system WITH one refinement pass;
    batched via the Pallas lane-major kernel when vmapped (falls back to
    cyclic reduction when the kernel's VMEM/width guards fail). The
    unbatched path also uses cyclic reduction — on TPU a single
    K-sequential scan is pure latency (59ms vs 6ms at K=51 on v5e)."""
    from . import cyclic_reduction as _cr

    x = _cr.solve(D, O, r)
    resid = r - _btridiag.matvec(D, O, x)
    return x + _cr.solve(D, O, resid)


@solve_auto.def_vmap
def _solve_auto_vmap(axis_size, in_batched, D, O, r):
    def ensure(x, batched):
        if batched:
            return x
        return jnp.broadcast_to(x, (axis_size,) + x.shape)

    D = ensure(D, in_batched[0])
    O = ensure(O, in_batched[1])
    r = ensure(r, in_batched[2])
    B, K, w, _ = D.shape
    if usable(K, w):
        pad = (-B) % LANES
        if pad:
            eye = jnp.broadcast_to(
                jnp.eye(w, dtype=D.dtype), (pad, K, w, w)
            )
            D = jnp.concatenate([D, eye], axis=0)
            O = jnp.concatenate(
                [O, jnp.zeros((pad,) + O.shape[1:], O.dtype)], axis=0
            )
            r = jnp.concatenate(
                [r, jnp.zeros((pad,) + r.shape[1:], r.dtype)], axis=0
            )
        bt = pick_block(D.shape[0], K, w)
        out = solve_lanes(D, O, r, False, 1, bt)[:B]
    else:
        from . import cyclic_reduction as _cr

        def one(Db, Ob, rb):
            x = _cr.solve(Db, Ob, rb)
            resid = rb - _btridiag.matvec(Db, Ob, x)
            return x + _cr.solve(Db, Ob, resid)

        out = jax.vmap(one)(D, O, r)
    return out, True
