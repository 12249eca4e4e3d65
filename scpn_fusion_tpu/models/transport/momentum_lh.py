"""Toroidal momentum transport + L-H transition model.

Role-parity with the reference's ``core/momentum_transport.py`` (1D
toroidal-rotation diffusion with NBI torque, Prandtl-number closure) and
``core/lh_transition.py`` (Martin 2008 power-threshold scaling with
hysteresis between back/forward transitions).  Traceable design: the
rotation step is the same Thomas-solve Crank-Nicolson pattern as the
thermal channels (one ``lax.scan`` tridiagonal solve), and the L-H state
machine is a branch-free ``jnp.where`` ladder usable inside scan-based
scenario loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from scpn_fusion_tpu.ops.tridiag import thomas_solve


# ---------------------------------------------------------------------------
# L-H transition
# ---------------------------------------------------------------------------

def martin_lh_threshold_mw(ne20, b_t, surface_m2):
    """Martin et al. (2008) scaling:
    P_LH = 0.0488 ne20^0.717 B^0.803 S^0.941  [MW]."""
    return (0.0488 * jnp.maximum(ne20, 1e-6) ** 0.717
            * jnp.maximum(b_t, 1e-6) ** 0.803
            * jnp.maximum(surface_m2, 1e-6) ** 0.941)


def plasma_surface_area(r_m, a_m, kappa):
    return 4.0 * jnp.pi ** 2 * r_m * a_m * jnp.sqrt(
        0.5 * (1.0 + kappa ** 2))


class LHState(NamedTuple):
    h_mode: jnp.ndarray       # bool
    p_threshold_mw: jnp.ndarray
    margin: jnp.ndarray       # P_net / P_LH


def lh_transition_step(p_net_mw, ne20, b_t, r_m, a_m, kappa,
                       h_mode: jnp.ndarray,
                       *, hysteresis: float = 0.8) -> LHState:
    """Branch-free L-H / H-L state update.

    Forward transition when P_net > P_LH; back transition only when the
    power falls below ``hysteresis * P_LH`` (the reference's hysteresis
    band, ``lh_transition.py``).
    """
    s = plasma_surface_area(r_m, a_m, kappa)
    p_lh = martin_lh_threshold_mw(ne20, b_t, s)
    go_h = p_net_mw > p_lh
    stay_h = p_net_mw > hysteresis * p_lh
    new_mode = jnp.where(h_mode, stay_h, go_h)
    return LHState(h_mode=new_mode, p_threshold_mw=p_lh,
                   margin=p_net_mw / jnp.maximum(p_lh, 1e-9))


def confinement_multiplier(h_mode, *, h98_h: float = 1.0,
                           h98_l: float = 0.6):
    """H98 factor by confinement mode (L-mode ~0.6, H-mode ~1.0)."""
    return jnp.where(h_mode, h98_h, h98_l)


# ---------------------------------------------------------------------------
# Toroidal momentum transport
# ---------------------------------------------------------------------------

class MomentumParams(NamedTuple):
    r_m: jnp.ndarray
    a_m: jnp.ndarray
    prandtl: jnp.ndarray      # chi_phi / chi_i
    pinch_v_m_s: jnp.ndarray  # inward momentum pinch velocity (>0 inward)


def nbi_torque_density(rho: jnp.ndarray, p_nbi_mw, r_tangency_m, r_m,
                       *, deposition_width: float = 0.3,
                       e_beam_kev: float = 500.0,
                       mass_amu: float = 2.0) -> jnp.ndarray:
    """Gaussian-deposited NBI torque density [N m / m^3-ish normalised]:
    total torque T = P / v_beam * R_tan distributed over the profile."""
    v_beam = 4.38e5 * jnp.sqrt(jnp.maximum(e_beam_kev, 1.0) / mass_amu)
    total_torque = p_nbi_mw * 1e6 / v_beam * r_tangency_m
    shape = jnp.exp(-(rho / deposition_width) ** 2)
    norm = jnp.trapezoid(shape * rho, rho) * 2.0 * jnp.pi ** 2 \
        * r_m * jnp.asarray(1.0)
    return total_torque * shape / jnp.maximum(norm, 1e-12)


def momentum_cn_step(omega: jnp.ndarray, chi_i: jnp.ndarray,
                     torque: jnp.ndarray, n_i: jnp.ndarray,
                     rho: jnp.ndarray, dt, params: MomentumParams,
                     *, edge_omega: float = 0.0) -> jnp.ndarray:
    """One Crank-Nicolson step of the rotation diffusion equation.

    d(n m R^2 omega)/dt = (1/rho) d/drho [rho n m R^2 (chi_phi d omega/drho
    + V_p omega)] + torque; normalised to omega units with the inertia
    folded into the source term (reference ``momentum_transport.py``
    reduced form).
    """
    n = rho.shape[0]
    drho = rho[1] - rho[0]
    chi_phi = params.prandtl * chi_i
    alpha = chi_phi * dt / (2.0 * drho ** 2 * params.a_m ** 2)

    # inertia ~ n_i m R^2; torque -> domega source
    inertia = jnp.maximum(n_i, 1e-6) * 3.34e-27 * params.r_m ** 2 * 1e19
    src = torque * dt / jnp.maximum(inertia, 1e-30)

    lower = -alpha[1:]
    upper = -alpha[:-1]
    diag = 1.0 + 2.0 * alpha
    # explicit half
    lap = jnp.zeros_like(omega)
    lap = lap.at[1:-1].set(alpha[1:-1] * (omega[2:] - 2.0 * omega[1:-1]
                                          + omega[:-2]))
    rhs = omega + lap + src
    # boundary rows: zero-gradient axis, Dirichlet edge
    diag = diag.at[0].set(1.0 + alpha[0])
    rhs = rhs.at[-1].set(edge_omega)
    diag = diag.at[-1].set(1.0)
    lower = lower.at[-1].set(0.0)
    upper = upper.at[0].set(-alpha[0])
    return thomas_solve(lower, diag, upper, rhs)


class RotationTrace(NamedTuple):
    omega: jnp.ndarray        # (n_steps, n_rho)
    v_tor_core_m_s: jnp.ndarray


def evolve_rotation(omega0: jnp.ndarray, chi_i: jnp.ndarray,
                    torque: jnp.ndarray, n_i: jnp.ndarray,
                    rho: jnp.ndarray, dt, n_steps: int,
                    params: MomentumParams) -> RotationTrace:
    import jax

    def step(om, _):
        om1 = momentum_cn_step(om, chi_i, torque, n_i, rho, dt, params)
        return om1, om1

    _, hist = jax.lax.scan(step, omega0, None, length=n_steps)
    return RotationTrace(omega=hist,
                         v_tor_core_m_s=hist[:, 0] * params.r_m)
