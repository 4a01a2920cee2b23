"""Radau IIA(3) collocation scheme (VERDICT r2 missing #3 / next #8).

The reference's eDymos requests Radau transcription at order 3
(eDymos.cpp:443-466). The compressed scheme in transcribe/collocation.py
must be EXACTLY the 2-stage Radau IIA method:

    A = [[5/12, -1/12], [3/4, 1/4]],  b = [3/4, 1/4],  c = [1/3, 1]

These tests pin that claim independently of the compression algebra.
"""
import jax
import jax.numpy as jnp
import numpy as np

from etol_tpu.transcribe import collocation


def _solve_step(f, x0, dt, scheme, t0=0.0, u=None):
    """Solve the one-step implicit relation defect(x1) = 0 for x1 by
    damped fixed-point/Newton (numpy, f64) — the step map the scheme
    defines."""
    from scipy.optimize import fsolve

    u0 = u if u is not None else np.zeros(1)

    def defect(x1):
        return np.asarray(
            collocation.step_defect(
                f,
                jnp.asarray(x0), jnp.asarray(u0),
                jnp.asarray(x1), jnp.asarray(u0),
                jnp.asarray(t0), jnp.asarray(dt),
                None, scheme,
            ),
            np.float64,
        )

    x1 = fsolve(defect, x0 + dt * np.asarray(f(
        jnp.asarray(x0), jnp.asarray(u0), jnp.asarray(t0), None
    )), xtol=1e-12)
    # the defect evaluates in f32 under the test conftest; the root
    # is good to ~f32 eps relative
    assert np.max(np.abs(defect(x1))) < 2e-5
    return x1


def test_radau_stability_function():
    """For x' = lam x the one-step map must equal the Radau IIA(3)
    stability function R(z) = (1 + z/3) / (1 - 2z/3 + z^2/6)."""
    lam = -2.3

    def f(x, u, t, data):
        return lam * x

    for dt in (0.1, 0.5, 1.0, 4.0):
        x1 = _solve_step(f, np.array([1.0]), dt, "radau")
        z = lam * dt
        R = (1 + z / 3) / (1 - 2 * z / 3 + z * z / 6)
        np.testing.assert_allclose(x1[0], R, rtol=3e-5)


def test_radau_matches_butcher_tableau_nonlinear():
    """On a nonlinear ODE the compressed defect's root must equal the
    classic 2-stage Radau IIA step solved from its Butcher tableau."""
    def fnp(x):
        return np.array([x[1], -np.sin(x[0]) - 0.1 * x[1]])  # pendulum

    def f(x, u, t, data):
        return jnp.stack([x[1], -jnp.sin(x[0]) - 0.1 * x[1]])

    from scipy.optimize import fsolve

    x0 = np.array([1.2, -0.3])
    dt = 0.25
    A = np.array([[5 / 12, -1 / 12], [3 / 4, 1 / 4]])
    b = np.array([3 / 4, 1 / 4])

    def stage_eqs(K):
        K = K.reshape(2, 2)
        out = np.empty_like(K)
        for i in range(2):
            Xi = x0 + dt * (A[i, 0] * K[0] + A[i, 1] * K[1])
            out[i] = K[i] - fnp(Xi)
        return out.reshape(-1)

    K = fsolve(stage_eqs, np.tile(fnp(x0), 2), xtol=1e-13).reshape(2, 2)
    x1_tableau = x0 + dt * (b[0] * K[0] + b[1] * K[1])

    x1 = _solve_step(f, x0, dt, "radau")
    np.testing.assert_allclose(x1, x1_tableau, atol=3e-5)


def _linear_step_map(lam, dt, scheme):
    """One-step amplification factor for x' = lam x: the defect is
    LINEAR in x1, so its root comes exactly from two evaluations
    (defect(0), defect(1)) — no root-finder noise."""
    def f(x, u, t, data):
        return lam * x

    def defect(x1):
        return float(
            collocation.step_defect(
                f,
                jnp.asarray(np.array([1.0])), jnp.zeros(1),
                jnp.asarray(np.array([x1])), jnp.zeros(1),
                jnp.asarray(0.0), jnp.asarray(dt),
                None, scheme,
            )[0]
        )

    a = defect(0.0)
    b = defect(1.0) - a
    return -a / b


def test_radau_third_order_convergence():
    """Global error on x' = -x over [0, 1] must shrink ~ dt^3 (observed
    order >= 2.7 between successive halvings)."""
    errs = []
    for n in (2, 4, 8):  # keep errors far above the f32 eval noise
        R = _linear_step_map(-1.0, 1.0 / n, "radau")
        errs.append(abs(R**n - np.exp(-1.0)))
    orders = [
        np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)
    ]
    assert min(orders) > 2.7, (errs, orders)


def test_radau_more_accurate_than_trapezoid():
    """At equal step count Radau(3) beats trapezoid(2) on a stiff-ish
    ODE — the accuracy claim behind mapping eDymos' Radau request to
    this scheme rather than silently downgrading."""
    n, dt = 8, 1.0 / 8
    Rr = _linear_step_map(-8.0, dt, "radau")
    Rt = _linear_step_map(-8.0, dt, "trapezoidal")
    exact = np.exp(-8.0)
    assert abs(Rr**n - exact) < abs(Rt**n - exact)


def test_radau_solves_canonical_ocp():
    """End-to-end: the canonical OCP under scheme='radau' solves to the
    same optimum as trapezoidal (ocp_2d_ex1; linear dynamics, so every
    scheme is exact and the optima must agree closely)."""
    from etol_tpu.models import canonical_ocp_2d
    from etol_tpu.solve import SolverConfig, solve

    vgp, nlp = canonical_ocp_2d(scheme="radau")
    data, dims = vgp.to_device()
    res = solve(nlp, SolverConfig(), data)
    assert int(res.status) == 1
    assert float(res.viol_eq) < 1e-4
    assert 1.25 <= float(res.obj) <= 1.8
