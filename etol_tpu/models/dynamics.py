"""Vehicle dynamics as plain JAX functions ``f(x, u, t, data) -> xdot``.

The reference expresses dynamics as per-backend callbacks (difference
equations in MILP form, etol_glpk_example1.cpp:113-129; ODE right-hand
sides in NLP form, etol_psopt_example1.cpp:117-137, and in OMPL form,
etol_ompl_example1.cpp:63-73). Here one JAX function serves every solver
mode, every derivative order (via jax.grad/jacfwd) and every batch size
(via vmap) — bfloat16/f32-friendly, shape-static, no control flow.
"""
from __future__ import annotations

import jax.numpy as jnp


def single_integrator(x, u, t, data):
    """xdot = u. The canonical ETOL vehicle (2D when nx=2).

    MILP form: x_k = x_{k-1} + dt*u_k (etol_glpk_example1.cpp:113-129,
    use scheme="euler"); NLP form: xdot = u (etol_psopt_example1.cpp:
    117-137, any scheme).
    """
    return u[: x.shape[0]]


def single_integrator_l1(x, u, t, data):
    """Single integrator with abs-epigraph controls.

    The MILP examples use 4 controls for a 2D vehicle: u0, u1 drive the
    dynamics; u2, u3 are epigraph variables with u2 >= |u0|, u3 >= |u1|
    (absConstraint, etol_glpk_example1.cpp:131-158) so the L1 objective
    min sum(u2+u3) is linear. Dynamics only see the first nx controls.
    """
    return u[: x.shape[0]]


def l1_epigraph_constraints(x, u, t, data):
    """The four abs-epigraph rows, <= 0 feasible:
    u0 - u2 <= 0, -u0 - u2 <= 0, u1 - u3 <= 0, -u1 - u3 <= 0."""
    return jnp.stack([u[0] - u[2], -u[0] - u[2], u[1] - u[3], -u[1] - u[3]])


def double_integrator(x, u, t, data):
    """2D double integrator: x = [px, py, vx, vy], u = [ax, ay]."""
    return jnp.concatenate([x[2:4], u[:2]])


def point_mass_3d(x, u, t, data):
    """3D point mass / velocity-controlled: x = [px, py, pz], u = velocity."""
    return u[:3]


def unicycle(x, u, t, data):
    """2D UAS kinematics with bounded speed/turn rate (BASELINE.json
    config 2): x = [px, py, heading], u = [speed, turn_rate]."""
    return jnp.stack([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]])


def fixed_wing_3dof(x, u, t, data):
    """Nonlinear 3-DOF fixed-wing point-mass (BASELINE.json config 4).

    States  x = [px, py, h, V, gamma, psi]  (position, altitude, airspeed,
    flight-path angle, heading) in KILOMETER units — km and km/s keep
    every state O(1) so f32 collocation defects sit far above the
    rounding floor (meter units put positions ~1e3 and the defect noise
    eps*|x| ~ 1e-4 above any useful feasibility tolerance);
    controls u = [load_factor, bank, throttle].

        px'    = V cos(gamma) cos(psi)
        py'    = V cos(gamma) sin(psi)
        h'     = V sin(gamma)
        V'     = g (throttle - sin(gamma)) - k_d V^2
        gamma' = (g / V) (n cos(phi) - cos(gamma))
        psi'   = g n sin(phi) / (V cos(gamma))

    with g = 9.81e-3 km/s^2, drag k_d = 10 /km, and V kept away from
    zero by the state lower bound (set V_lb > 0 in the VGP).
    """
    g = 9.81e-3
    k_d = 10.0
    V = jnp.maximum(x[3], 1e-4)
    gamma, psi = x[4], x[5]
    n, phi, thr = u[0], u[1], u[2]
    cg = jnp.cos(gamma)
    return jnp.stack(
        [
            V * cg * jnp.cos(psi),
            V * cg * jnp.sin(psi),
            V * jnp.sin(gamma),
            g * (thr - jnp.sin(gamma)) - k_d * V * V,
            (g / V) * (n * jnp.cos(phi) - cg),
            g * n * jnp.sin(phi) / (V * cg),
        ]
    )
