"""Miller local equilibrium geometry for flux-tube gyrokinetics.

JAX port of the reference's geometry module (``core/gk_geometry.py:26-160``):
Miller parameterisation R(theta) = R0 + r cos(theta + arcsin(delta) sin
(theta)), Z = kappa r sin(theta), metric coefficients from the (r, theta)
Jacobian, vacuum toroidal field, q-consistent poloidal field with metric
stretching, and the curvature components (Miller Eqs. 18-19 approximation).
All arrays are jnp; the construction is traceable so geometry parameters can
be differentiated through.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MillerGeometry(NamedTuple):
    theta: jnp.ndarray
    r_s: jnp.ndarray           # R(theta)
    z_s: jnp.ndarray
    b_mag: jnp.ndarray
    jacobian: jnp.ndarray
    g_rr: jnp.ndarray
    g_rt: jnp.ndarray
    g_tt: jnp.ndarray
    kappa_n: jnp.ndarray
    kappa_g: jnp.ndarray
    b_dot_grad_theta: jnp.ndarray


def miller_geometry(
    *,
    r0: float = 2.78,
    a: float = 1.0,
    rho: float = 0.5,
    kappa: float = 1.0,
    delta: float = 0.0,
    s_kappa: float = 0.0,
    s_delta: float = 0.0,
    q: float = 1.4,
    s_hat: float = 0.78,
    alpha_mhd: float = 0.0,
    dr_dr: float = 0.0,
    b0: float = 2.0,
    n_theta: int = 64,
    n_period: int = 2,
) -> MillerGeometry:
    r = rho * a
    theta = jnp.linspace(-n_period * jnp.pi, n_period * jnp.pi, n_theta)
    delta_angle = jnp.arcsin(jnp.clip(delta, -0.99, 0.99))

    r_s = r0 + r * jnp.cos(theta + delta_angle * jnp.sin(theta))
    z_s = kappa * r * jnp.sin(theta)

    dr_dt = -r * jnp.sin(theta + delta_angle * jnp.sin(theta)) \
        * (1 + delta_angle * jnp.cos(theta))
    dz_dt = kappa * r * jnp.cos(theta)

    delta_angle_shear = jnp.where(
        delta != 0.0, s_delta * delta / jnp.sqrt(jnp.maximum(1.0 - delta**2, 1e-12)), 0.0)
    dr_dr_tot = (jnp.cos(theta + delta_angle * jnp.sin(theta)) + dr_dr
                 - jnp.sin(theta + delta_angle * jnp.sin(theta))
                 * jnp.sin(theta) * delta_angle_shear)
    dz_dr_r = kappa * (1.0 + s_kappa) * jnp.sin(theta)

    jac = dr_dr_tot * dz_dt - dr_dt * dz_dr_r
    jac = jnp.where(jnp.abs(jac) < 1e-30, 1e-30, jac)

    g_rr = (dr_dt**2 + dz_dt**2) / jac**2
    g_rt = -(dr_dr_tot * dr_dt + dz_dr_r * dz_dt) / jac**2
    g_tt = (dr_dr_tot**2 + dz_dr_r**2) / jac**2

    b_phi = b0 * r0 / r_s
    theta_arc = jnp.sqrt(dr_dt**2 + dz_dt**2)
    metric_stretch = theta_arc / max(r, 1e-6)
    b_p = (jnp.abs(b_phi) * max(r, 1e-6)
           / (q * r_s * jnp.maximum(metric_stretch, 1e-12)))
    b_mag = jnp.sqrt(b_phi**2 + b_p**2)
    b_dot_grad_theta = b_p / b_mag * jnp.sqrt(g_tt)

    inv_r = 1.0 / r_s
    kappa_n = -inv_r * (jnp.cos(theta) + (s_hat * theta - alpha_mhd) * jnp.sin(theta))
    kappa_g = -inv_r * (jnp.sin(theta) - (s_hat * theta - alpha_mhd) * jnp.cos(theta))

    return MillerGeometry(theta, r_s, z_s, b_mag, jac, g_rr, g_rt, g_tt,
                          kappa_n, kappa_g, b_dot_grad_theta)


def circular_geometry(
    r0: float = 2.78, a: float = 1.0, rho: float = 0.5, q: float = 1.4,
    s_hat: float = 0.78, b0: float = 2.0, n_theta: int = 64,
    n_period: int = 2,
) -> MillerGeometry:
    """Circular limit (Cyclone Base Case verification geometry)."""
    return miller_geometry(r0=r0, a=a, rho=rho, kappa=1.0, delta=0.0,
                           q=q, s_hat=s_hat, b0=b0, n_theta=n_theta,
                           n_period=n_period)
