"""Direct-collocation defect construction.

The reference delegates transcription to its solver plugins: difference
equations in the MILP backends (one row per state per step, eGLPK.cpp:334+),
Legendre collocation in PSOPT (ePSOPT.cpp:218-276) and Radau in Dymos
(eDymos.cpp:443-535). Here transcription is a pure function of arrays:
``defects(X, U, ...)`` returns every dynamics residual at once, ready for
``vmap`` over a problem batch and for `jax.jacfwd`/`jax.grad` — no AD tapes,
no per-node callback loops.

Schemes:
* ``euler``        x_{k+1} = x_k + dt f(x_{k+1}, u_{k+1}, t_{k+1})
                   — matches the MILP examples' difference equation
                   (etol_glpk_example1.cpp:113-129: x_k depends on u_k).
* ``trapezoidal``  standard trapezoid rule.
* ``hermite_simpson``  compressed Hermite–Simpson (3rd order), midpoint
                   controls interpolated.
* ``radau``        compressed Radau IIA, 2 stages / 3rd order, stiffly
                   accurate and L-stable — the scheme eDymos requests
                   (Radau transcription, order 3, eDymos.cpp:443-466).
                   Compression: the quadratic interpolant through
                   (x_k, x_{k+1}, dt·f_{k+1}) is collocated at
                   c = 1/3; eliminating the interior stage recovers the
                   exact Radau IIA tableau (A = [[5/12, -1/12],
                   [3/4, 1/4]], b = [3/4, 1/4], c = [1/3, 1]) with one
                   defect per step and no extra decision variables —
                   the same trick compressed Hermite–Simpson plays on
                   the Gauss–Lobatto cubic.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# dynamics signature: f(x [nx], u [nu], t [], data) -> xdot [nx]
DynamicsFn = Callable

SCHEMES = ("euler", "trapezoidal", "hermite_simpson", "radau")


def node_times(nsteps: int, dt, dtype=None):
    k = jnp.arange(nsteps + 1, dtype=dtype or jnp.result_type(dt))
    return k * dt


def step_defect(
    f: DynamicsFn,
    x0, u0, x1, u1,   # node k and node k+1 states/controls
    t0, dt,
    data,
    scheme: str = "trapezoidal",
) -> jnp.ndarray:
    """Collocation defect of ONE step (nodes k -> k+1), shape [nx].

    The single copy of the scheme math: :func:`defects` maps it over a
    trajectory and :meth:`etol_tpu.transcribe.nlp.NLP.step_defect` calls
    it per node pair (the solver's block-structured interface)."""
    t1 = t0 + dt
    if scheme == "euler":
        return x1 - x0 - dt * f(x1, u1, t1, data)
    f0 = f(x0, u0, t0, data)
    f1 = f(x1, u1, t1, data)
    if scheme == "trapezoidal":
        return x1 - x0 - (dt / 2.0) * (f0 + f1)
    if scheme == "hermite_simpson":
        xm = 0.5 * (x0 + x1) + (dt / 8.0) * (f0 - f1)
        um = 0.5 * (u0 + u1)
        fm = f(xm, um, 0.5 * (t0 + t1), data)
        return x1 - x0 - (dt / 6.0) * (f0 + 4.0 * fm + f1)
    if scheme == "radau":
        # Radau IIA(3), compressed: interior stage at c = 1/3 from the
        # quadratic through (x0, x1, dt f1); defect = the b-row. At the
        # root this is EXACTLY the 2-stage Radau IIA step: substituting
        # the defect equation into xs reproduces the A-matrix row
        # x0 + dt (5/12 fs - 1/12 f1). f0 is unused (stiffly accurate
        # scheme — only stage derivatives enter).
        xs = x0 + (5.0 * (x1 - x0) - 2.0 * dt * f1) / 9.0
        us = (2.0 * u0 + u1) / 3.0
        fs = f(xs, us, t0 + dt / 3.0, data)
        return x1 - x0 - dt * (0.75 * fs + 0.25 * f1)
    raise ValueError(f"unknown scheme {scheme!r}; pick from {SCHEMES}")


def defects(
    f: DynamicsFn,
    X: jnp.ndarray,   # [K, nx] with K = nsteps+1
    U: jnp.ndarray,   # [K, nu]
    dt,
    data,
    scheme: str = "trapezoidal",
) -> jnp.ndarray:
    """All collocation defects, shape [nsteps, nx]; zero iff dynamically
    feasible."""
    K = X.shape[0]
    ts = node_times(K - 1, dt, X.dtype)
    return jax.vmap(
        lambda x0, u0, x1, u1, t0: step_defect(
            f, x0, u0, x1, u1, t0, dt, data, scheme
        )
    )(X[:-1], U[:-1], X[1:], U[1:], ts[:-1])


def integral_cost(
    ell: Callable,    # ell(x, u, t, data) -> scalar integrand
    X: jnp.ndarray,
    U: jnp.ndarray,
    dt,
    data,
    scheme: str = "trapezoidal",
) -> jnp.ndarray:
    """Integrated running cost matching the transcription order.

    ``euler`` uses the right-Riemann sum (the MILP examples' plain sum over
    steps, etol_glpk_example1.cpp:105-111 — each node weighted dt... the
    reference's MILP objective is an unweighted sum; use weights=1 there via
    ``sum_cost``). Trapezoid for the NLP parity (Lagrange term,
    ePSOPT.cpp:186-216).
    """
    K = X.shape[0]
    ts = node_times(K - 1, dt, X.dtype)
    lv = jax.vmap(lambda x, u, t: ell(x, u, t, data))(X, U, ts)  # [K]
    if scheme == "euler":
        return dt * jnp.sum(lv[1:])
    w = jnp.ones((K,), X.dtype).at[0].set(0.5).at[-1].set(0.5)
    return dt * jnp.sum(w * lv)


def sum_cost(ell, X, U, dt, data) -> jnp.ndarray:
    """Plain unweighted per-node sum — the MILP objective form
    (eGurobi.cpp:370-386 sums the user objective over nodes)."""
    K = X.shape[0]
    ts = node_times(K - 1, dt, X.dtype)
    lv = jax.vmap(lambda x, u, t: ell(x, u, t, data))(X, U, ts)
    return jnp.sum(lv)
