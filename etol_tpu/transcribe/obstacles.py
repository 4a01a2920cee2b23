"""Device-side obstacle constraint evaluation.

All functions are JAX-traceable, shape-static, and mask-aware; they evaluate
per *node* and are ``vmap``-ed over the horizon (and again over the problem
batch) by the transcription layer — the reference's per-node callback loops
(e.g. eDymos.cpp:74-177) collapsed into one fused array program.

Sign convention follows the reference's NLP examples: a constraint value
``g`` is **feasible when g <= 0** (etol_psopt_example1.cpp:181, :246).
Masked-out (padding) entries always report feasible.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.problem import ObstacleData, TrackData
from ..core.trajectory import linear_interpolation


def ellipse_values(p: jnp.ndarray, obs: ObstacleData) -> jnp.ndarray:
    """Per-edge-ellipse exclusion values at a 2D point ``p``.

    g_e = asq*bsq - (bsq*dx'^2 + asq*dy'^2), the rotated-ellipse penalty of
    the reference NLP obstacle callback (etol_psopt_example1.cpp:159-187);
    g_e > 0 means the point is inside edge-ellipse e. Returns [E].
    """
    e = obs.ellipses
    dx = p[0] - e[:, 0]
    dy = p[1] - e[:, 1]
    c, s = e[:, 2], e[:, 3]
    delx = c * dx - s * dy
    dely = s * dx + c * dy
    asq, bsq = e[:, 4], e[:, 5]
    g = asq * bsq - (bsq * delx**2 + asq * dely**2)
    # normalise so the constraint scale is O(1) regardless of edge length
    g = g / jnp.maximum(asq * bsq, 1e-12)
    return jnp.where(obs.ellipse_mask > 0, g, -1.0)


def track_values(
    p: jnp.ndarray, t: jnp.ndarray, tracks: TrackData
) -> jnp.ndarray:
    """Moving-obstacle ball values at point ``p``, time ``t``.

    Center linearly interpolated along the track's waypoint schedule,
    then g = r^2 - |p - c(t)|^2 over the track's real dimensions
    (etol_psopt_example1.cpp:226-247; n-dimensional per vgp.rst —
    ``dim_mask`` ignores padded dims, so a 2-D track in a 3-D state
    space constrains only the ground projection). g > 0 means inside
    the protected ball. Returns [T], normalised by r^2.
    """
    T, _, D = tracks.xy.shape
    pd = p[:D]
    if pd.shape[0] < D:  # state has fewer dims than the track table
        pd = jnp.concatenate(
            [pd, jnp.zeros((D - pd.shape[0],), p.dtype)]
        )

    def one(times, xy, r, dmask):
        c = linear_interpolation(t, times, xy)
        d2 = jnp.sum(dmask * (pd - c) ** 2)
        rsq = r * r
        return (rsq - d2) / jnp.maximum(rsq, 1e-12)

    g = jnp.stack(
        [
            one(
                tracks.times[i],
                tracks.xy[i],
                tracks.radius[i],
                tracks.dim_mask[i],
            )
            for i in range(T)
        ]
    ) if T > 0 else jnp.zeros((0,))
    return jnp.where(tracks.mask > 0, g, -1.0)


def track_centers(ts: jnp.ndarray, tracks: TrackData) -> jnp.ndarray:
    """Interpolated track centers at the node times ``ts`` [K] -> [K, T, D].

    The centers depend on time only, never on the decision variables, so a
    solver evaluates this ONCE per problem and reuses the table across every
    AL/gradient/Hessian/line-search evaluation — the searchsorted+gather in
    :func:`track_values` would otherwise run per node per iteration."""
    def at_t(t):
        return jax.vmap(
            lambda times, xy: linear_interpolation(t, times, xy)
        )(tracks.times, tracks.xy)  # [T, D]

    return jax.vmap(at_t)(ts)


def track_values_cached(
    p: jnp.ndarray, centers_k: jnp.ndarray, tracks: TrackData
) -> jnp.ndarray:
    """Same values as :func:`track_values` but from a precomputed center row
    ``centers_k`` [T, D] (one row of :func:`track_centers`). Pure elementwise
    math — no gathers in the solver's hot path."""
    T, D = centers_k.shape
    pd = p[:D]
    if pd.shape[0] < D:
        pd = jnp.concatenate(
            [pd, jnp.zeros((D - pd.shape[0],), p.dtype)]
        )
    d2 = jnp.sum(tracks.dim_mask * (pd[None, :] - centers_k) ** 2, axis=-1)
    rsq = tracks.radius * tracks.radius
    g = (rsq - d2) / jnp.maximum(rsq, 1e-12)
    return jnp.where(tracks.mask > 0, g, -1.0)


def halfspace_margins(p: jnp.ndarray, obs: ObstacleData) -> jnp.ndarray:
    """Signed containment margin per convex piece.

    For piece j with outward halfspaces n.x <= b, returns
    m_j = min over real rows of (b - n.p): m_j > 0 iff p is strictly inside
    piece j. This is the normal-form analog of the per-side big-M rows
    (eGLPK.cpp:190-246). Returns [P]; masked pieces report -inf-ish outside.
    """
    hs = obs.halfspaces  # [P, H, 3]
    margin = hs[..., 2] - (
        hs[..., 0] * p[0] + hs[..., 1] * p[1]
    )  # [P, H]
    big = jnp.asarray(1e6, dtype=margin.dtype)
    margin = jnp.where(obs.hs_mask > 0, margin, big)
    m = jnp.min(margin, axis=-1)
    return jnp.where(obs.piece_mask > 0, m, -big)


def inside_any_piece(p: jnp.ndarray, obs: ObstacleData) -> jnp.ndarray:
    """Boolean: is ``p`` inside any convex obstacle piece? (ValidityChecker
    analog, eOMPL.cpp:95-111, but over the convex partition.)"""
    return jnp.any(halfspace_margins(p, obs) > 0)


def piece_values(
    p: jnp.ndarray, obs: ObstacleData, tau: float = 0.05
) -> jnp.ndarray:
    """Smooth conservative containment value per convex piece, [P].

    The edge ellipses are thin bands around the boundary: a node can hop
    *over* them into the polygon interior when steps are large. This
    constraint covers the full interior: for piece j,
    ``g_j = softmin_tau(margins) + tau*log(H)``, an overestimate of the
    true min margin (min <= softmin + tau*log H), so ``g_j <= 0``
    certifies the point is outside piece j; it inflates the piece by at
    most ``tau*log H`` outside. Positive and growing toward the interior
    -> the AL pushes interior nodes out.
    """
    hs = obs.halfspaces  # [P, H, 3]
    H = hs.shape[1]
    margin = hs[..., 2] - (hs[..., 0] * p[0] + hs[..., 1] * p[1])
    big = jnp.asarray(1e3, margin.dtype)
    margin = jnp.where(obs.hs_mask > 0, margin, big)
    softmin = -tau * jax.nn.logsumexp(-margin / tau, axis=-1)
    n_rows = jnp.maximum(jnp.sum(obs.hs_mask, axis=-1), 1.0)
    g = softmin + tau * jnp.log(n_rows)
    return jnp.where(obs.piece_mask > 0, g, -big)


def collision_values(
    p, t, obs: ObstacleData, tracks: TrackData, form: str = "both"
):
    """All obstacle constraint values stacked, feasible <= 0.

    ``form``: "ellipses" (reference NLP parity, [E+T]), "pieces"
    (interior-covering softmin containment, [P+T]), or "both"
    ([E+P+T], the default — bands stop edge crossings, containment
    stops interior hops)."""
    parts = []
    if form in ("ellipses", "both"):
        parts.append(ellipse_values(p, obs))
    if form in ("pieces", "both"):
        parts.append(piece_values(p, obs))
    parts.append(track_values(p, t, tracks))
    return jnp.concatenate(parts)


def collision_values_cached(
    p, centers_k, obs: ObstacleData, tracks: TrackData, form: str = "both"
):
    """:func:`collision_values` with precomputed track centers ``centers_k``
    [T, D] — identical values and ordering, gather-free."""
    parts = []
    if form in ("ellipses", "both"):
        parts.append(ellipse_values(p, obs))
    if form in ("pieces", "both"):
        parts.append(piece_values(p, obs))
    parts.append(track_values_cached(p, centers_k, tracks))
    return jnp.concatenate(parts)
