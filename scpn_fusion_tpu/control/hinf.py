"""H-infinity robust controller synthesis (jittable Riccati machinery).

JAX re-design of the reference's ``HInfinityController``
(``control/h_infinity_controller.py:60-380``): the central two-Riccati
solution

    A^T X + X A + X (gamma^-2 B1 B1^T - B2 B2^T) X + C1^T C1 = 0
    A Y + Y A^T + Y (gamma^-2 C1^T C1 - C2^T C2) Y + B1 B1^T = 0

with F = -B2^T X and L = Y C2^T, feasibility rho(XY) < gamma^2, and gamma
bisection.  Where the reference calls scipy's Schur-based
``solve_continuous_are`` (not traceable), the Riccati equations here are
solved by integrating the differential Riccati equation to steady state with
a fixed-step RK4 ``lax.scan`` — fully jittable and differentiable, adequate
for the small (n <= ~10) plant models the control stack uses.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_steps",))
def solve_care_ode(
    a: jnp.ndarray,
    s: jnp.ndarray,      # the quadratic term: X S X with sign convention below
    q: jnp.ndarray,
    *,
    dt: float = 0.01,
    n_steps: int = 4000,
) -> jnp.ndarray:
    """Steady state of dX/dt = A^T X + X A - X S X + Q (X0 = 0), via RK4."""
    def rhs(x):
        return a.T @ x + x @ a - x @ s @ x + q

    def step(x, _):
        k1 = rhs(x)
        k2 = rhs(x + 0.5 * dt * k1)
        k3 = rhs(x + 0.5 * dt * k2)
        k4 = rhs(x + dt * k3)
        x_new = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        x_new = 0.5 * (x_new + x_new.T)  # keep symmetric
        return x_new, None

    x0 = jnp.zeros_like(a)
    x_final, _ = jax.lax.scan(step, x0, None, length=n_steps)
    return x_final


class HInfGains(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    f: jnp.ndarray          # state feedback  u = F x
    l: jnp.ndarray          # observer gain
    gamma: jnp.ndarray
    spectral_radius_xy: jnp.ndarray
    robust_feasible: jnp.ndarray


def synthesize_hinf(
    a: jnp.ndarray,
    b1: jnp.ndarray,
    b2: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    gamma,
    *,
    riccati_steps: int = 4000,
    riccati_dt: float = 0.01,
) -> HInfGains:
    """Central H-inf solution at a given gamma (jittable)."""
    g2 = gamma * gamma
    s_x = b2 @ b2.T - (b1 @ b1.T) / g2
    x = solve_care_ode(a, s_x, c1.T @ c1, dt=riccati_dt, n_steps=riccati_steps)
    s_y = c2.T @ c2 - (c1.T @ c1) / g2
    y = solve_care_ode(a.T, s_y, b1 @ b1.T, dt=riccati_dt, n_steps=riccati_steps)
    f = -b2.T @ x
    l = y @ c2.T
    eig = jnp.linalg.eigvals(x @ y)
    rho = jnp.max(jnp.abs(eig))
    return HInfGains(x, y, f, l, jnp.asarray(gamma),
                     rho, rho < g2 * (1.0 - 1e-6))


def find_optimal_gamma(
    a, b1, b2, c1, c2,
    *,
    gamma_lo: float = 0.5,
    gamma_hi: float = 100.0,
    n_bisect: int = 20,
    riccati_steps: int = 2000,
) -> float:
    """Bisection on the feasibility boundary (host loop over jitted checks)."""
    lo, hi = float(gamma_lo), float(gamma_hi)
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        g = synthesize_hinf(a, b1, b2, c1, c2, mid,
                            riccati_steps=riccati_steps)
        feasible = bool(g.robust_feasible) and bool(
            jnp.all(jnp.isfinite(g.x)) and jnp.all(jnp.isfinite(g.y)))
        if feasible:
            hi = mid
        else:
            lo = mid
    return hi


class HInfState(NamedTuple):
    x_hat: jnp.ndarray   # observer state


def hinf_step(
    gains: HInfGains,
    a: jnp.ndarray,
    b2: jnp.ndarray,
    c2: jnp.ndarray,
    state: HInfState,
    y_meas: jnp.ndarray,
    dt,
    u_max: float = 1e8,
):
    """One output-feedback step: observer update + saturated state feedback
    (forward-Euler discretisation of the central controller)."""
    u = gains.f @ state.x_hat
    u = jnp.clip(u, -u_max, u_max)
    innov = y_meas - c2 @ state.x_hat
    dx = a @ state.x_hat + b2 @ u + gains.l @ innov
    return HInfState(state.x_hat + dt * dx), u
