"""Resistive poloidal-flux diffusion / q-profile evolution, compiled.

JAX port of the reference's ``CurrentDiffusionSolver``
(``core/current_diffusion.py:55-380``; Rust twin
``fusion-core/src/current_diffusion.rs``): Crank-Nicolson implicit step of

    dpsi/dt = D(rho) L[psi] + R0 eta j_source,
    D = eta_neo / (mu0 a^2),   L = d_rr + (1/r) d_r   (cylindrical),

with the Sauter neoclassical parallel resistivity (Sauter 2002 Eqs. 13-15),
L'Hopital axis boundary, Dirichlet edge, q(rho) = -rho a^2 B0 / (R0 dpsi/drho).
Time evolution runs under ``lax.scan``; the tridiagonal solve is the shared
Thomas kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.ops.tridiag import thomas_solve

MU_0 = 4.0e-7 * jnp.pi
E_CHARGE = 1.602e-19
M_E = 9.109e-31
EPS0 = 8.854e-12


def neoclassical_resistivity(
    te_kev: jnp.ndarray,
    ne_19: jnp.ndarray,
    z_eff,
    epsilon: jnp.ndarray,
    q: jnp.ndarray,
    r0: float,
) -> jnp.ndarray:
    """Sauter neoclassical parallel resistivity [Ohm m] (vectorised).

    ``eta_neo = eta_Spitzer / F33(f_t)`` with the Sauter 1999 (PoP 6:2834)
    Eq. 13a banana-limit conductivity reduction
    ``F33(x) = 1 - (1 + 0.36/Z) x + 0.59/Z x^2 - 0.23/Z x^3`` and the
    standard trapped-fraction interpolation.  At eps = 0.3, Z_eff = 1 this
    gives the published ~3-4x enhancement over Spitzer (banana limit is
    the collisionless upper bound; the reference's ``current_diffusion.py``
    uses a ``c_r/(1-f_t)`` combination that saturates near 1.15x —
    under-resistive by ~3x at ITER-like eps, disclosed design delta)."""
    te = jnp.maximum(te_kev, 1e-3)
    ne = jnp.maximum(ne_19, 1e-3)
    eps = jnp.maximum(epsilon, 1e-6)
    ln_lambda = 17.0
    eta_spitzer = 1.65e-9 * z_eff * ln_lambda / te**1.5
    f_t = 1.0 - (1.0 - eps) ** 2 / (jnp.sqrt(jnp.maximum(1.0 - eps**2, 1e-12))
                                    * (1.0 + 1.46 * jnp.sqrt(eps)))
    f_t = jnp.clip(f_t, 0.0, 1.0)
    f33 = (1.0 - (1.0 + 0.36 / z_eff) * f_t
           + (0.59 / z_eff) * f_t**2 - (0.23 / z_eff) * f_t**3)
    eta_neo = eta_spitzer / jnp.clip(f33, 0.05, 1.0)
    return jnp.maximum(eta_neo, eta_spitzer)


def q_from_psi(rho: jnp.ndarray, psi: jnp.ndarray, r0: float, a: float,
               b0: float) -> jnp.ndarray:
    """q(rho) = -rho a^2 B0 / (R0 dpsi/drho), L'Hopital at the axis."""
    drho = rho[1] - rho[0]
    interior = (psi[2:] - psi[:-2]) / (2.0 * drho)
    left = (psi[1] - psi[0]) / drho
    right = (psi[-1] - psi[-2]) / drho
    dpsi = jnp.concatenate([left[None], interior, right[None]])
    denom = r0 * dpsi
    q = jnp.where(jnp.abs(denom) > 1e-12,
                  -rho * a**2 * b0 / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                  1.0)
    d2psi = (psi[2] - 2 * psi[1] + psi[0]) / drho**2
    q0 = jnp.where(jnp.abs(d2psi) > 1e-12,
                   -(a**2) * b0 / (r0 * jnp.where(jnp.abs(d2psi) > 1e-12, d2psi, 1.0)),
                   q[1])
    return jnp.abs(q.at[0].set(q0))


def resistive_diffusion_time(a: float, eta) -> jnp.ndarray:
    """tau_R = mu0 a^2 / eta [s]."""
    return MU_0 * a**2 / jnp.maximum(eta, 1e-12)


@dataclasses.dataclass(frozen=True)
class CurrentDiffusionParams:
    nr: int
    r0: float
    a: float
    b0: float

    def rho(self, dtype=jnp.float64) -> jnp.ndarray:
        return jnp.linspace(0.0, 1.0, self.nr, dtype=dtype)


def initial_psi(params: CurrentDiffusionParams, dtype=jnp.float64) -> jnp.ndarray:
    """Integrate dpsi/drho = -rho a^2 B0 / (R0 q) for q = 1 + 2 rho^2,
    anchored at psi(edge) = 0 (reference constructor)."""
    rho = params.rho(dtype)
    drho = 1.0 / (params.nr - 1)
    q_r = 1.0 + 2.0 * rho**2
    dpsi = -rho * params.a**2 * params.b0 / (params.r0 * q_r)
    # Trapezoidal integration (2nd order; the reference uses 1st-order Euler,
    # which biases q near the axis by ~10%).
    increments = jnp.concatenate(
        [jnp.zeros((1,), dtype), 0.5 * (dpsi[1:] + dpsi[:-1]) * drho])
    psi = jnp.cumsum(increments)
    return psi - psi[-1]


def step_current_diffusion(
    params: CurrentDiffusionParams,
    psi: jnp.ndarray,
    dt,
    te: jnp.ndarray,
    ne: jnp.ndarray,
    z_eff,
    j_source: jnp.ndarray,
) -> jnp.ndarray:
    """One Crank-Nicolson flux-diffusion step (reference ``step``)."""
    dtype = psi.dtype
    rho = params.rho(dtype)
    drho = 1.0 / (params.nr - 1)
    n = params.nr

    q_prof = q_from_psi(rho, psi, params.r0, params.a, params.b0)
    eps = rho * params.a / params.r0
    eta = neoclassical_resistivity(te, ne, z_eff, eps, q_prof, params.r0)
    d = eta / (MU_0 * params.a**2)

    alpha = dt / 2.0
    drho2 = drho**2
    r_int = rho[1:-1]
    coeff_prev = d[1:-1] * (1.0 / drho2 - 1.0 / (2.0 * r_int * drho))
    coeff_curr = d[1:-1] * (-2.0 / drho2)
    coeff_next = d[1:-1] * (1.0 / drho2 + 1.0 / (2.0 * r_int * drho))

    sub = jnp.zeros((n - 1,), dtype)
    diag = jnp.zeros((n,), dtype)
    sup = jnp.zeros((n - 1,), dtype)
    rhs = jnp.zeros((n,), dtype)

    # Axis: L(psi)_0 = 4 D_0 (psi_1 - psi_0)/drho^2 (L'Hopital).
    ax = 4.0 * d[0] / drho2
    diag = diag.at[0].set(1.0 + alpha * ax)
    sup = sup.at[0].set(-alpha * ax)
    rhs = rhs.at[0].set(psi[0] + alpha * ax * (psi[1] - psi[0])
                        + dt * params.r0 * eta[0] * j_source[0])

    sub = sub.at[:-1].set(-alpha * coeff_prev)
    diag = diag.at[1:-1].set(1.0 - alpha * coeff_curr)
    sup = sup.at[1:].set(-alpha * coeff_next)
    l_psi = (coeff_prev * psi[:-2] + coeff_curr * psi[1:-1]
             + coeff_next * psi[2:])
    rhs = rhs.at[1:-1].set(psi[1:-1] + alpha * l_psi
                           + dt * params.r0 * eta[1:-1] * j_source[1:-1])

    # Edge Dirichlet.
    diag = diag.at[-1].set(1.0)
    sub = sub.at[-1].set(0.0)
    rhs = rhs.at[-1].set(psi[-1])

    return thomas_solve(sub, diag, sup, rhs)


@partial(jax.jit, static_argnames=("params", "n_steps"))
def run_current_diffusion(
    params: CurrentDiffusionParams,
    psi0: jnp.ndarray,
    dt,
    te: jnp.ndarray,
    ne: jnp.ndarray,
    z_eff,
    j_source: jnp.ndarray,
    *,
    n_steps: int,
):
    """Evolve psi for n_steps; returns (psi_final, q_trace)."""
    def step(p, _):
        p_new = step_current_diffusion(params, p, dt, te, ne, z_eff, j_source)
        q = q_from_psi(params.rho(p.dtype), p_new, params.r0, params.a, params.b0)
        return p_new, {"q0": q[0], "q_edge": q[-1]}

    return jax.lax.scan(step, psi0, None, length=n_steps)
