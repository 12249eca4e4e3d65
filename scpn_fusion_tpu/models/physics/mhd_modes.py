"""Discrete MHD mode models: TAE, tearing/Rutherford, locked mode, MRTI.

Role-parity with the reference's mode-physics modules
(``core/alfven_eigenmodes.py`` TAE gap frequencies + fast-ion drive screen,
``core/tearing_mode_theory.py`` cylindrical Delta' + Rutherford island
evolution, ``core/tearing_mode_coupling.py``, ``core/locked_mode.py``
torque-balance locking bifurcation, ``core/mrti.py``
magneto-Rayleigh-Taylor growth).  All functions are jnp-traceable so
parameter scans vmap; island/torque evolutions run under ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MU0 = 4.0e-7 * jnp.pi
M_D = 3.3436e-27


# ---------------------------------------------------------------------------
# Toroidal Alfven eigenmodes
# ---------------------------------------------------------------------------

class TAEResult(NamedTuple):
    f_tae_hz: jnp.ndarray        # gap-centre frequency
    gap_width_hz: jnp.ndarray
    v_alfven_m_s: jnp.ndarray
    drive_ratio: jnp.ndarray     # fast-ion drive / total damping
    unstable: jnp.ndarray


def alfven_speed(b_t, n_i_19, m_ion_kg: float = M_D):
    rho = jnp.maximum(n_i_19, 1e-6) * 1e19 * m_ion_kg
    return b_t / jnp.sqrt(MU0 * rho)


def tae_frequency(b_t, n_i_19, q, r0_m):
    """TAE gap centre f = v_A / (4 pi q R)."""
    return alfven_speed(b_t, n_i_19) / (4.0 * jnp.pi
                                        * jnp.maximum(q, 0.1) * r0_m)


def tae_stability(*, b_t, n_i_19, q, r0_m, a_m, beta_fast_pct,
                  v_fast_over_va, damping_rate: float = 0.01) -> TAEResult:
    """Reduced TAE drive/damping screen.

    Drive ~ beta_fast * (v_fast/v_A - threshold) when the fast ions are
    super-Alfvenic; damping is a lumped continuum/radiative rate.  The
    verdict contract matches the reference screen: unstable when the drive
    exceeds damping.
    """
    v_a = alfven_speed(b_t, n_i_19)
    f0 = tae_frequency(b_t, n_i_19, q, r0_m)
    eps = a_m / r0_m
    gap = f0 * 2.0 * eps                       # gap width ~ 2 eps f0
    resonant = jnp.maximum(v_fast_over_va - 1.0, 0.0)
    drive = 0.5 * (beta_fast_pct / 100.0) * resonant
    ratio = drive / jnp.maximum(damping_rate, 1e-12)
    return TAEResult(f_tae_hz=f0, gap_width_hz=gap, v_alfven_m_s=v_a,
                     drive_ratio=ratio, unstable=ratio > 1.0)


# ---------------------------------------------------------------------------
# Tearing modes: Delta' + Rutherford island evolution
# ---------------------------------------------------------------------------

class TearingResult(NamedTuple):
    delta_prime: jnp.ndarray
    classically_unstable: jnp.ndarray
    r_s_m: jnp.ndarray           # rational-surface minor radius


def delta_prime_cylindrical(rho: jnp.ndarray, q: jnp.ndarray,
                            j_phi: jnp.ndarray, a_m, *, m: int = 2,
                            n: int = 1) -> TearingResult:
    """Cylindrical tearing-stability index for the (m, n) surface.

    Reduced closed form: Delta' * r_s is estimated from the normalised
    current-gradient drive at the rational surface,
    ``Delta' r_s ~ -2m + alpha * (r_s |dj/dr| / j(0))`` — the standard
    step-current scaling the reference's theory module tabulates.  A
    rational surface sitting on the steep flank of the current channel is
    the unstable configuration; far outside the channel the drive vanishes
    and the mode reverts to the stable vacuum index -2m.
    """
    q_rat = m / n
    idx = jnp.argmin(jnp.abs(q - q_rat))
    r_s = rho[idx] * a_m
    dj = jnp.gradient(j_phi, rho[1] - rho[0])
    j0 = jnp.maximum(jnp.abs(j_phi[0]), 1e-12)
    drive = jnp.abs(dj[idx]) * rho[idx] / j0
    dp = (-2.0 * m + 8.0 * drive) / jnp.maximum(r_s, 1e-6)
    on_grid = jnp.abs(q[idx] - q_rat) < 0.5
    dp = jnp.where(on_grid, dp, -2.0 * m / jnp.maximum(r_s, 1e-6))
    return TearingResult(delta_prime=dp, classically_unstable=dp > 0.0,
                         r_s_m=r_s)


class IslandTrace(NamedTuple):
    w_m: jnp.ndarray             # island width history
    saturated_w_m: jnp.ndarray
    locked_risk: jnp.ndarray     # width above the locking threshold


def rutherford_island_evolution(*, delta_prime, r_s_m, eta_ohm_m,
                                w0_m: float = 1e-3,
                                w_sat_cap_m: float = 0.3,
                                dt: float = 1e-3, n_steps: int = 2000,
                                lock_threshold_m: float = 0.05
                                ) -> IslandTrace:
    """Modified Rutherford equation dw/dt = (eta/mu0)(Delta' - w/w_sat^2 *
    saturation term); saturated width from Delta'(w) = Delta' - alpha w."""
    tau_factor = 1.22 * eta_ohm_m / MU0
    alpha = jnp.abs(delta_prime) / jnp.maximum(w_sat_cap_m, 1e-6)

    def step(w, _):
        dwdt = tau_factor * (delta_prime - alpha * w)
        w1 = jnp.clip(w + dt * dwdt, 0.0, 1.0)
        return w1, w1

    _, hist = jax.lax.scan(step, jnp.asarray(w0_m), None, length=n_steps)
    w_sat = jnp.where(delta_prime > 0,
                      delta_prime / jnp.maximum(alpha, 1e-12), 0.0)
    return IslandTrace(w_m=hist, saturated_w_m=w_sat,
                       locked_risk=hist[-1] > lock_threshold_m)


# ---------------------------------------------------------------------------
# Locked mode (torque balance bifurcation)
# ---------------------------------------------------------------------------

class LockedModeResult(NamedTuple):
    omega_final: jnp.ndarray     # final island rotation / omega0
    locked: jnp.ndarray
    braking_torque_ratio: jnp.ndarray


def locked_mode_evolution(*, w_island_m, b_error_mt, omega0_hz,
                          viscous_time_s: float = 0.1,
                          r_s_m: float = 1.0, dt: float = 1e-3,
                          n_steps: int = 3000) -> LockedModeResult:
    """Island rotation braking by the error-field wall torque.

    Normalised form (x = omega/omega0, time in viscous times):
    ``dx/dtau = (1 - x) - kappa x / (x^2 + delta^2)`` with the braking
    number ``kappa ~ (w^2 B_err)^2`` (shielding weakens as the mode
    slows).  Integrating the balance exhibits the locking bifurcation the
    reference's module screens for: beyond a critical error field the
    stable fast root disappears and the rotation collapses (locked).
    """
    w_ref, b_ref_mt, gain, delta = 0.05, 1.0, 0.05, 0.05
    kappa = ((jnp.asarray(w_island_m) / w_ref) ** 2
             * (jnp.asarray(b_error_mt) / b_ref_mt)) ** 2 * gain
    d_tau = dt / viscous_time_s

    def step(x, _):
        dx = (1.0 - x) - kappa * x / (x ** 2 + delta ** 2)
        return jnp.clip(x + d_tau * dx, 0.0, 2.0), None

    x_f, _ = jax.lax.scan(step, jnp.asarray(1.0), None, length=n_steps)
    return LockedModeResult(omega_final=x_f,
                            locked=x_f < 0.1,
                            braking_torque_ratio=kappa)


# ---------------------------------------------------------------------------
# Magneto-Rayleigh-Taylor
# ---------------------------------------------------------------------------

class MRTIResult(NamedTuple):
    gamma_s: jnp.ndarray         # growth rate (0 when stabilised)
    k_cutoff_m: jnp.ndarray      # wavenumber above which tension stabilises
    stabilised: jnp.ndarray


def mrti_growth_rate(*, g_eff_m_s2, k_m, b_t, n_i_19, theta_kb_rad=0.0,
                     atwood: float = 1.0) -> MRTIResult:
    """MRT dispersion: gamma^2 = A g k - (k . B)^2 / (mu0 rho)
    (reference ``core/mrti.py`` contract; Rust twin
    ``fusion-physics/src/mrti.rs``)."""
    rho = jnp.maximum(n_i_19, 1e-6) * 1e19 * M_D
    k_par = k_m * jnp.cos(theta_kb_rad)
    tension = (k_par * b_t) ** 2 / (MU0 * rho)
    gamma2 = atwood * g_eff_m_s2 * k_m - tension
    gamma = jnp.sqrt(jnp.maximum(gamma2, 0.0))
    cos2 = jnp.maximum(jnp.cos(theta_kb_rad) ** 2, 1e-12)
    k_cut = atwood * g_eff_m_s2 * MU0 * rho / (b_t ** 2 * cos2)
    return MRTIResult(gamma_s=gamma, k_cutoff_m=k_cut,
                      stabilised=gamma2 <= 0.0)
