"""VGP -> NLP assembly.

This is the TPU rebirth of the reference's callback ABI (``f_t`` over
``std::any``, ETOL_Types.hpp:111-117): a user problem is a set of plain JAX
functions with signature ``f(x, u, t, data)`` (arrays in, arrays out) — one
definition serves values, gradients (``jax.grad``), Jacobians and batching,
where the reference needed six backend-specific expression dialects
(SURVEY.md §1).

``NLP`` assembles, for static :class:`~etol_tpu.core.types.Dims`:

* ``objective(z, data)``      scalar cost (sign-corrected for maximize)
* ``eq_residuals(z, data)``   collocation defects (+ user equalities) == 0
* ``ineq_residuals(z, data)`` obstacle + user path constraints        <= 0
* ``bounds(data)``            per-entry box on the flat decision vector,
  encoding variable bounds, the initial-state clamp (addX0 parity,
  eGurobi.cpp:278-303) and the terminal tolerance band (addXf parity,
  eGurobi.cpp:305-336).

Decision vector layout is node-major: ``z.reshape(K, nx+nu)`` with states
first — the block structure a banded/block-tridiagonal KKT solver needs.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.problem import VGPData
from ..core.types import Dims
from . import collocation, obstacles


@dataclasses.dataclass(frozen=True)
class NLP:
    """Static description of a transcribed VGP family.

    Hashable (function identity), so it can be closed over / passed as a
    static argument to ``jax.jit``.
    """

    dims: Dims
    dynamics: Callable                    # f(x, u, t, data) -> xdot [nx];
                                          # with x_delay/u_delay > 0:
                                          # f(Xw, Uw, t, data) where
                                          # Xw [x_delay+1, nx] and
                                          # Uw [u_delay+1, nu] end at the
                                          # current node (row -1 = now)
    running_cost: Callable                # ell(x, u, t, data) -> scalar;
                                          # with n_params > 0 an extra
                                          # trailing arg p [n_params]
    terminal_cost: Optional[Callable] = None   # phi(xN, data) -> scalar
    path_ineq: Tuple[Callable, ...] = ()  # g(x, u, t, data[, p]) -> <= 0
    path_eq: Tuple[Callable, ...] = ()    # h(x, u, t, data[, p]) -> == 0
    scheme: str = "trapezoidal"
    cost_form: str = "integral"           # "integral" | "sum"
    use_obstacles: bool = True
    obstacle_form: str = "both"           # "ellipses" | "pieces" | "both"
    obstacle_margin: float = 0.0          # inflate: require g <= -margin
    maximize: bool = False
    guess: Optional[Callable] = None      # guess(data) -> z (model-aware)
    x_delay: int = 0                      # state history steps visible to
                                          # the dynamics (get_delayed_state
                                          # parity, ePSOPT.cpp:231-239)
    u_delay: int = 0                      # control history steps
                                          # (get_delayed_control parity,
                                          # ePSOPT.cpp:240-248)

    # ---- layout -------------------------------------------------------
    @property
    def nz(self) -> int:
        return self.dims.nz

    @property
    def delay(self) -> int:
        """History window depth: 0 = memoryless (standard) dynamics."""
        return max(self.x_delay, self.u_delay)

    def unpack(self, z: jnp.ndarray):
        d = self.dims
        ZU = z.reshape(d.nodes, d.node_width)
        return ZU[:, : d.nx], ZU[:, d.nx : d.nx + d.nu]

    def pack(self, X: jnp.ndarray, U: jnp.ndarray, P=None) -> jnp.ndarray:
        parts = [X, U]
        if self.dims.n_params:
            if P is None:
                P = jnp.zeros(
                    (X.shape[0], self.dims.n_params), X.dtype
                )
            parts.append(P)
        return jnp.concatenate(parts, axis=-1).reshape(-1)

    def _split(self, z_node):
        """One node's slot -> (x, u, p)."""
        d = self.dims
        return (
            z_node[: d.nx],
            z_node[d.nx : d.nx + d.nu],
            z_node[d.nx + d.nu :],
        )

    def _user(self, f, x, u, t, data: VGPData, p):
        """Invoke a user callback: params (when declared) ride as a
        trailing argument, so memoryless problems keep the plain
        ``f(x, u, t, data)`` signature."""
        if self.dims.n_params:
            return f(x, u, t, data, p)
        return f(x, u, t, data)

    # ---- node-separable pieces (the structured-solver interface) ------
    #
    # The solver exploits the horizon structure: the cost and every
    # inequality are node-local, the defects couple adjacent nodes only,
    # so the Gauss-Newton Hessian is block tridiagonal with node width
    # nx+nu (cf. the per-step transcription loops of the reference MILP
    # backends, eGLPK.cpp:279). ``z_node = [x_k, u_k]``.

    def node_cost(self, z_node, k, data: VGPData) -> jnp.ndarray:
        """Cost contribution of node k; sums to :meth:`objective`."""
        d = self.dims
        x, u, p = self._split(z_node)
        t = k.astype(z_node.dtype) * data.dt
        lv = self._user(self.running_cost, x, u, t, data, p)
        if self.cost_form == "sum":
            J = lv
        else:  # trapezoid weights on the node grid
            half = jnp.logical_or(k == 0, k == d.nsteps)
            w = jnp.where(half, 0.5, 1.0).astype(z_node.dtype)
            J = data.dt * w * lv
        if self.terminal_cost is not None:
            J = J + jnp.where(
                k == d.nsteps, self.terminal_cost(x, data), 0.0
            )
        return -J if self.maximize else J

    def step_defect(self, z_k, z_k1, k, data: VGPData) -> jnp.ndarray:
        """Collocation defect of step k (nodes k -> k+1), shape [nx].

        Delegates to :func:`etol_tpu.transcribe.collocation.step_defect`
        — the single copy of the scheme math. Only valid for memoryless
        dynamics; delayed problems go through :meth:`pair_defect`."""
        d = self.dims
        x0, u0, _ = self._split(z_k)
        x1, u1, _ = self._split(z_k1)
        t0 = k.astype(z_k.dtype) * data.dt
        return collocation.step_defect(
            self.dynamics, x0, u0, x1, u1, t0, data.dt, data, self.scheme
        )

    # ---- delayed dynamics (rhorizon as a true history window) ----------
    #
    # The reference's NLP callbacks can consume x(t - j dt)/u(t - j dt)
    # windows (get_delayed_state/get_delayed_control, ePSOPT.cpp:231-248;
    # the eSCIP rhorizon-deep variable window, eSCIP.cpp:355-375). Here a
    # delayed problem declares x_delay/u_delay and its dynamics sees
    # fixed-shape history slices — pre-horizon history clamps to node 0
    # (which the bounds pin to x0, matching the reference's rhorizon
    # pinning). The defect of step k then involves nodes k-delay..k+1;
    # the solver keeps its Hessian block-tridiagonal by differentiating
    # only the two newest nodes (exact gradients, structured curvature).

    def step_windows(self, Z: jnp.ndarray) -> jnp.ndarray:
        """[nsteps, delay+2, w] sliding windows over the node axis: row j
        of window k is node k - delay + j (clamped at node 0)."""
        r = self.delay
        Zp = jnp.concatenate(
            [jnp.broadcast_to(Z[:1], (r,) + Z.shape[1:]), Z], axis=0
        )
        idx = (
            jnp.arange(self.dims.nsteps)[:, None]
            + jnp.arange(r + 2)[None, :]
        )
        return Zp[idx]

    def _hist(self, W, row):
        """Dynamics arguments at window row ``row`` (node-local [x, u]
        or history slices when delayed)."""
        d = self.dims
        X = W[:, : d.nx]
        U = W[:, d.nx : d.nx + d.nu]
        if self.delay == 0:
            return X[row], U[row]
        # row is a static python int (delay or delay+1): plain slices
        xw = X[row - self.x_delay : row + 1]
        uw = U[row - self.u_delay : row + 1]
        return xw, uw

    def pair_defect(self, W, k, data: VGPData) -> jnp.ndarray:
        """Collocation defect of step k from its window W
        [delay+2, node_width] (rows = nodes k-delay .. k+1), shape [nx].

        Equals :meth:`step_defect` when ``delay == 0``. Delayed schemes:
        ``euler`` and ``trapezoidal`` (Hermite-Simpson midpoints are
        ill-defined under a discrete-node delay)."""
        r = self.delay
        if r == 0:
            return self.step_defect(W[0], W[1], k, data)
        d = self.dims
        dtype = W.dtype
        t0 = k.astype(dtype) * data.dt
        t1 = t0 + data.dt
        x0 = W[r, : d.nx]
        x1 = W[r + 1, : d.nx]
        xw1, uw1 = self._hist(W, r + 1)
        f1 = self.dynamics(xw1, uw1, t1, data)
        if self.scheme == "euler":
            return x1 - x0 - data.dt * f1
        if self.scheme == "trapezoidal":
            xw0, uw0 = self._hist(W, r)
            f0 = self.dynamics(xw0, uw0, t0, data)
            return x1 - x0 - (data.dt / 2.0) * (f0 + f1)
        raise ValueError(
            f"scheme {self.scheme!r} does not support delayed dynamics; "
            "use 'euler' or 'trapezoidal'"
        )

    def node_eq(self, z_node, k, data: VGPData) -> jnp.ndarray:
        """User path equalities at node k, stacked flat (possibly 0-size)."""
        x, u, p = self._split(z_node)
        t = k.astype(z_node.dtype) * data.dt
        parts = [
            jnp.atleast_1d(self._user(h, x, u, t, data, p)).reshape(-1)
            for h in self.path_eq
        ]
        if not parts:
            return jnp.zeros((0,), z_node.dtype)
        return jnp.concatenate(parts)

    def node_ineq(self, z_node, k, data: VGPData) -> jnp.ndarray:
        """All inequality values at node k (obstacles + user), <= 0
        feasible, stacked flat (possibly 0-size)."""
        x, u, p = self._split(z_node)
        t = k.astype(z_node.dtype) * data.dt
        parts = []
        if self.use_obstacles:
            # full state: polygon zones use (x, y); tracks use as many
            # dims as their waypoint datums carry (2-D circle or n-D ball)
            gv = obstacles.collision_values(
                x, t, data.obstacles, data.tracks, self.obstacle_form
            )
            parts.append(gv + self.obstacle_margin)
        for g in self.path_ineq:
            parts.append(
                jnp.atleast_1d(self._user(g, x, u, t, data, p)).reshape(-1)
            )
        if not parts:
            return jnp.zeros((0,), z_node.dtype)
        return jnp.concatenate(parts)

    def node_ineq_cached(self, z_node, k, tc_k, data: VGPData):
        """:meth:`node_ineq` with a precomputed track-center row ``tc_k``
        [T, D] (one row of :meth:`track_center_table`) — identical values
        and stacking order, gather-free: the solver's hot path evaluates
        this per AL value, gradient, Hessian and line-search candidate."""
        x, u, p = self._split(z_node)
        t = k.astype(z_node.dtype) * data.dt
        parts = []
        if self.use_obstacles:
            gv = obstacles.collision_values_cached(
                x, tc_k, data.obstacles, data.tracks, self.obstacle_form
            )
            parts.append(gv + self.obstacle_margin)
        for g in self.path_ineq:
            parts.append(
                jnp.atleast_1d(self._user(g, x, u, t, data, p)).reshape(-1)
            )
        if not parts:
            return jnp.zeros((0,), z_node.dtype)
        return jnp.concatenate(parts)

    def pos_dims(self, data: VGPData) -> int:
        """State dims the obstacle constraints read: 2-D polygons plus
        up-to-D-dim track balls. The GN Hessian assembly exploits this —
        obstacle rows contribute a [pos_dims, pos_dims] block, not a
        full node block."""
        return min(max(2, int(data.tracks.xy.shape[-1])), self.dims.nx)

    def node_ineq_obs(self, x, k, tc_k, data: VGPData) -> jnp.ndarray:
        """Obstacle rows of :meth:`node_ineq_cached` only (a function of
        the state's position dims), same values/order. 0-size when
        ``use_obstacles`` is off."""
        if not self.use_obstacles:
            return jnp.zeros((0,), x.dtype)
        gv = obstacles.collision_values_cached(
            x, tc_k, data.obstacles, data.tracks, self.obstacle_form
        )
        return gv + self.obstacle_margin

    def node_ineq_user(self, z_node, k, data: VGPData) -> jnp.ndarray:
        """User path-inequality rows of :meth:`node_ineq_cached` only
        (full node width), same values/order."""
        x, u, p = self._split(z_node)
        t = k.astype(z_node.dtype) * data.dt
        parts = [
            jnp.atleast_1d(self._user(g, x, u, t, data, p)).reshape(-1)
            for g in self.path_ineq
        ]
        if not parts:
            return jnp.zeros((0,), z_node.dtype)
        return jnp.concatenate(parts)

    def track_center_table(self, data: VGPData) -> jnp.ndarray:
        """Moving-obstacle centers at every node time, [K, T, D]: a
        function of node TIME only, so the solver builds it once per
        problem and the hot path stays gather-free."""
        ts = jnp.arange(self.dims.nodes, dtype=data.x0.dtype) * data.dt
        return obstacles.track_centers(ts, data.tracks)

    # ---- scaling hooks (solver-facing) ---------------------------------
    @staticmethod
    def _var_scale(lo, hi):
        half = 0.5 * (hi - lo)
        ok = jnp.isfinite(half) & (half > 1e-9)
        return jnp.where(ok, jnp.clip(half, 1e-2, 1e4), 1.0)

    def variable_scales(self, data: VGPData) -> jnp.ndarray:
        """Per-variable scale of one node's [x, u] slot, [nx+nu], from
        the declared bounds. Badly scaled problems (fixed-wing positions
        ~1e3 vs angles ~1) need the Newton system, damping and the
        stationarity test in scaled coordinates. Deliberately not the
        per-node boxes: x0 pinning and the terminal tolerance band would
        shrink those nodes' scales to ~xtol and stiffen the damping."""
        parts = [
            self._var_scale(data.x_lb, data.x_ub),
            self._var_scale(data.u_lb, data.u_ub),
        ]
        if self.dims.n_params:
            parts.append(self._var_scale(data.p_lb, data.p_ub))
        return jnp.concatenate(parts)

    def defect_scales(self, data: VGPData) -> jnp.ndarray:
        """Per-row scale of one step defect, [nx]: a defect row lives in
        state units, so its f32 noise floor is eps * |state|; dividing
        by max(1, state scale) makes the violation tolerance relative on
        large-range problems."""
        return jnp.maximum(self._var_scale(data.x_lb, data.x_ub), 1.0)

    # ---- aggregate views ----------------------------------------------
    def objective(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        Z = z.reshape(self.dims.nodes, -1)
        ks = jnp.arange(self.dims.nodes)
        return jnp.sum(
            jax.vmap(lambda zn, k: self.node_cost(zn, k, data))(Z, ks)
        )

    def step_defects(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        """All collocation defects, [nsteps, nx]."""
        Z = z.reshape(self.dims.nodes, -1)
        ks = jnp.arange(self.dims.nsteps)
        if self.delay:
            return jax.vmap(
                lambda W, k: self.pair_defect(W, k, data)
            )(self.step_windows(Z), ks)
        return jax.vmap(
            lambda zk, zk1, k: self.step_defect(zk, zk1, k, data)
        )(Z[:-1], Z[1:], ks)

    def node_eqs(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        """User path equalities at all nodes, [K, m_eq_node]."""
        Z = z.reshape(self.dims.nodes, -1)
        ks = jnp.arange(self.dims.nodes)
        return jax.vmap(lambda zn, k: self.node_eq(zn, k, data))(Z, ks)

    def node_ineqs(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        """All inequality values at all nodes, [K, m_in_node]."""
        Z = z.reshape(self.dims.nodes, -1)
        ks = jnp.arange(self.dims.nodes)
        return jax.vmap(lambda zn, k: self.node_ineq(zn, k, data))(Z, ks)

    def eq_residuals(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        parts = [self.step_defects(z, data).reshape(-1)]
        if self.path_eq:
            parts.append(self.node_eqs(z, data).reshape(-1))
        return jnp.concatenate(parts)

    def ineq_residuals(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        return self.node_ineqs(z, data).reshape(-1)

    def bounds(self, data: VGPData):
        """Box bounds on z: variable bounds everywhere; nodes k < rhorizon
        pinned to x0; terminal node confined to the goal tolerance band
        intersected with the variable bounds."""
        d = self.dims
        K = d.nodes
        x_lb = jnp.broadcast_to(data.x_lb, (K, d.nx))
        x_ub = jnp.broadcast_to(data.x_ub, (K, d.nx))
        r = max(d.rhorizon, 1)
        x_lb = x_lb.at[:r].set(data.x0)
        x_ub = x_ub.at[:r].set(data.x0)
        x_lb = x_lb.at[-1].set(
            jnp.maximum(data.xf - data.xtol, data.x_lb)
        )
        x_ub = x_ub.at[-1].set(
            jnp.minimum(data.xf + data.xtol, data.x_ub)
        )
        u_lb = jnp.broadcast_to(data.u_lb, (K, d.nu))
        u_ub = jnp.broadcast_to(data.u_ub, (K, d.nu))
        lbs = [x_lb, u_lb]
        ubs = [x_ub, u_ub]
        if d.n_params:
            # masked dense columns: a param variable exists only inside
            # its [t_start, t_stop] activation window (the reference
            # creates one solver variable per in-window timestep,
            # eGLPK.cpp:275-332); outside, the column pins to 0
            ts = jnp.arange(K, dtype=data.p_lb.dtype)[:, None] * data.dt
            active = (ts >= data.p_window[None, :, 0] - 1e-9) & (
                ts <= data.p_window[None, :, 1] + 1e-9
            )
            lbs.append(jnp.where(active, data.p_lb[None, :], 0.0))
            ubs.append(jnp.where(active, data.p_ub[None, :], 0.0))
        lb = jnp.concatenate(lbs, axis=-1).reshape(-1)
        ub = jnp.concatenate(ubs, axis=-1).reshape(-1)
        return lb, ub

    # ---- initial guess ------------------------------------------------
    def initial_guess(self, data: VGPData) -> jnp.ndarray:
        """Model-aware guess when the NLP carries one, else straight-line
        state interpolation x0 -> xf with zero controls — the reference's
        default guess (eDymos ``setGuess``, eDymos.cpp:537-565)."""
        if self.guess is not None:
            return self.guess(data)
        d = self.dims
        K = d.nodes
        w = jnp.linspace(0.0, 1.0, K, dtype=data.x0.dtype)[:, None]
        X = (1.0 - w) * data.x0 + w * data.xf
        U = jnp.zeros((K, d.nu), data.x0.dtype)
        return self.pack(X, U)  # pack zero-fills param columns

    def score(self, z: jnp.ndarray, data: VGPData) -> jnp.ndarray:
        """User-facing objective value (undo the maximize sign flip)."""
        J = self.objective(z, data)
        return -J if self.maximize else J
