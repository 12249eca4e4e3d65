"""1.5D integrated transport stepper (multi-ion Crank-Nicolson), fully jitted.

TPU-native redesign of the reference's ``TransportSolver`` runtime
(``integrated_transport_solver_runtime.py:187-530``): one transport step —
species burn/fueling, auxiliary heating deposition, Patankar-implicit
radiation sinks, symmetric implicit electron-ion equilibration, Crank-Nicolson
implicit diffusion per channel via ``lax.scan`` Thomas solves, and the
in-step Picard predictor-corrector for the nonlinear chi closure — is one
pure function ``evolve_profiles``; multi-step scenarios run under
``lax.scan`` (``run_transport``) with zero host round-trips.

Parity notes (formulas and constants match the reference):
* CN system: ``(I - 0.5 dt L_h + dt nu_sink) T^{n+1} = T^n + 0.5 dt L_h T^n
  + dt S`` with cylindrical ``L_h = (1/r) d/dr(r chi dT/dr)`` on half-grid
  diffusivities (``runtime_utils.py:63-144``).
* BCs: axis Neumann (T0 = T1 via b0=1, c0=-1, rhs0=0), fixed edge
  (ion 0.1 keV, electron ``t_edge_kev``) (``runtime.py:222-230``).
* Radiation: Patankar linearisation ``nu = S_rad / T_old`` on the diagonal
  (``runtime.py:380-390``); equilibration symmetric-implicit with
  ``tau_eq = 0.01 Te^1.5 / max(ne/10, 0.1)`` clipped to [1 ms, 1 s]
  (``runtime.py:367-374``).
* Species: D/T burn sink ``n_D n_T <sigma v>``, He ash source with
  ``tau_He = tau_He_factor * tau_E`` pump, CN diffusion with D_species;
  ``ne`` from quasi-neutrality incl. tungsten ``Z_W(log Te)``; ``Z_eff``
  from the charge-weighted sum (``runtime_physics.py:260-320``).

Turbulent-backend closures: the default reduced-multichannel shape
chi = chi_CH + chi_gB, plus an optional NEURAL closure — the committed
transport surrogate evaluated per radial point with per-point OOD-index
fallback to the analytic closure (reference
``integrated_transport_solver_model.py:83-160``), threaded through
``evolve_profiles`` as a pytree so switching closures never recompiles.
tau_E for the He pump follows the IPB98(y,2) scaling chain by default
(``physics/scaling_burn.py``; reference ``scaling_laws.py:222-324``), with
the stored-energy/power estimate as the opt-out.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.models.transport.closures import (
    E_KEV_J,
    bosch_hale_sigmav,
    bremsstrahlung_power_density,
    chang_hinton_chi,
    gyro_bohm_chi,
    tungsten_radiation_rate,
)
from scpn_fusion_tpu.ops.tridiag import thomas_solve


@dataclasses.dataclass(frozen=True)
class TransportParams:
    """Static transport configuration (hashable, jit-static)."""

    nr: int = 50
    r0: float = 6.2
    a_minor: float = 2.0
    b0: float = 5.3
    kappa: float = 1.7
    a_ion: float = 2.0
    c_gb: float = 1.0
    ip_ma: float = 15.0
    # He-pump timescale: IPB98(y,2) chain by default; False reverts to the
    # stored-energy/power estimate (the round-1 documented simplification).
    use_ipb98_tau_he: bool = True
    # Neural-closure OOD gate: points whose max |z| vs the surrogate's
    # training envelope exceeds this fall back to the analytic closure.
    ood_sigma: float = 3.0
    multi_ion: bool = True
    t_edge_kev: float = 0.08
    d_species: float = 0.5
    tau_he_factor: float = 5.0
    aux_heating_profile_width: float = 0.1
    aux_heating_electron_fraction: float = 0.5
    picard_max_iter: int = 20
    picard_tol: float = 1e-5
    picard_theta: float = 0.5
    picard_damping: float = 0.15

    @property
    def drho(self) -> float:
        return 1.0 / (self.nr - 1)

    def rho(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.linspace(0.0, 1.0, self.nr, dtype=dtype)


class TransportState(NamedTuple):
    """Profile state pytree (reference ``TransportSolverState``,
    ``_integrated_transport_solver_base.py:36-155``)."""

    ti: jnp.ndarray       # keV
    te: jnp.ndarray       # keV
    ne: jnp.ndarray       # 1e19 m^-3
    n_d: jnp.ndarray
    n_t: jnp.ndarray
    n_he: jnp.ndarray
    n_imp: jnp.ndarray
    chi_i: jnp.ndarray    # m^2/s
    chi_e: jnp.ndarray
    d_n: jnp.ndarray
    q: jnp.ndarray        # safety factor profile
    z_eff: jnp.ndarray    # scalar


def initial_state(params: TransportParams, dtype=jnp.float32) -> TransportState:
    """Reference initial profiles (``_integrated_transport_solver_init.py:26-61``)."""
    rho = params.rho(dtype)
    te = 1.0 * (1.0 - rho**2)
    ne = 5.0 * (1.0 - rho**2) ** 0.5
    ones = jnp.ones_like(rho)
    return TransportState(
        ti=te, te=te, ne=ne,
        n_d=0.5 * ne, n_t=0.5 * ne,
        n_he=jnp.zeros_like(rho), n_imp=jnp.zeros_like(rho),
        chi_i=ones, chi_e=ones, d_n=ones,
        q=1.0 + 2.0 * rho**2,
        z_eff=jnp.asarray(1.5, dtype),
    )


# ── CN assembly (reference runtime_utils.py:63-144) ──────────────────────


def explicit_diffusion_rhs(t: jnp.ndarray, chi: jnp.ndarray,
                           rho: jnp.ndarray, drho: float) -> jnp.ndarray:
    """L_h(T) = (1/r) d/dr(r chi dT/dr), interior points (edges zero)."""
    n = t.shape[0]
    r = rho[1:-1]
    chi_ip = 0.5 * (chi[1:-1] + chi[2:])
    chi_im = 0.5 * (chi[1:-1] + chi[:-2])
    flux_ip = chi_ip * (r + 0.5 * drho) * (t[2:] - t[1:-1]) / drho
    flux_im = chi_im * (r - 0.5 * drho) * (t[1:-1] - t[:-2]) / drho
    out = jnp.zeros_like(t)
    return out.at[1:-1].set((flux_ip - flux_im) / (r * drho))


def build_cn_tridiag(chi: jnp.ndarray, dt, rho: jnp.ndarray, drho: float):
    """Sub/main/super diagonals of (I - 0.5 dt L_h) (interior rows)."""
    n = chi.shape[0]
    r = rho[1:-1]
    inv = 1.0 / (r * drho * drho)
    geo_ip = (r + 0.5 * drho) * inv
    geo_im = (r - 0.5 * drho) * inv
    chi_ip = 0.5 * (chi[1:-1] + chi[2:])
    chi_im = 0.5 * (chi[1:-1] + chi[:-2])
    coeff_ip = chi_ip * geo_ip
    coeff_im = chi_im * geo_im
    a = jnp.zeros((n - 1,), chi.dtype).at[:-1].set(-0.5 * dt * coeff_im)
    b = jnp.ones((n,), chi.dtype).at[1:-1].set(1.0 + 0.5 * dt * (coeff_ip + coeff_im))
    c = jnp.zeros((n - 1,), chi.dtype).at[1:].set(-0.5 * dt * coeff_ip)
    return a, b, c


def _cn_channel_solve(t_old, chi, dt, rhs_core, nu_sink, edge_value,
                      rho, drho):
    """One CN channel solve with axis-Neumann / fixed-edge BCs."""
    a, b, c = build_cn_tridiag(chi, dt, rho, drho)
    b = b + dt * nu_sink
    # Axis: T0 - T1 = 0; edge: T_{n-1} = edge_value.
    b = b.at[0].set(1.0).at[-1].set(1.0)
    c = c.at[0].set(-1.0)
    a = a.at[-1].set(0.0)
    rhs = rhs_core.at[0].set(0.0).at[-1].set(edge_value)
    t_new = thomas_solve(a, b, c, rhs)
    t_new = t_new.at[0].set(t_new[1]).at[-1].set(edge_value)
    # Sanitize with fallback to the old state, floors as in the reference.
    t_new = jnp.where(jnp.isfinite(t_new), t_new, t_old)
    return jnp.clip(t_new, 0.01, 1e3)


def _thermal_cn_step(params: TransportParams, dt, ti_old, te_old,
                     chi_i, chi_e, heat_i, nu_rad_i, nu_eq,
                     s_heat_e_aux, p_rad_line, ne, z_eff, rho, drho):
    """Ion then electron CN solves (sequential-implicit equilibration),
    reference ``_solve_thermal_cn_step`` (``runtime.py:187-292``)."""
    lh_i = explicit_diffusion_rhs(ti_old, chi_i, rho, drho)
    lh_i = jnp.where(jnp.isfinite(lh_i), lh_i, 0.0)
    rhs_i = ti_old + 0.5 * dt * lh_i + dt * heat_i + dt * nu_eq * te_old
    rhs_i = jnp.where(jnp.isfinite(rhs_i), rhs_i, ti_old)
    ti_new = _cn_channel_solve(ti_old, chi_i, dt, rhs_i,
                               nu_rad_i + nu_eq, 0.1, rho, drho)

    if not params.multi_ion:
        return ti_new, ti_new

    p_brem = bremsstrahlung_power_density(ne, te_old, z_eff)
    ne_safe = jnp.maximum(ne, 0.1) * 1e19
    s_brem_e = p_brem / (ne_safe * E_KEV_J)
    s_rad_e = p_rad_line / (ne_safe * E_KEV_J) * 0.5
    src_e = s_heat_e_aux + nu_eq * ti_new
    src_e = jnp.where(jnp.isfinite(src_e), src_e, 0.0)
    nu_rad_e = jnp.maximum((s_rad_e + s_brem_e) / jnp.maximum(te_old, 0.01), 0.0)
    nu_rad_e = jnp.where(jnp.isfinite(nu_rad_e), nu_rad_e, 0.0)

    lh_e = explicit_diffusion_rhs(te_old, chi_e, rho, drho)
    lh_e = jnp.where(jnp.isfinite(lh_e), lh_e, 0.0)
    rhs_e = te_old + 0.5 * dt * lh_e + dt * src_e
    rhs_e = jnp.where(jnp.isfinite(rhs_e), rhs_e, te_old)
    te_new = _cn_channel_solve(te_old, chi_e, dt, rhs_e,
                               nu_rad_e + nu_eq, params.t_edge_kev, rho, drho)
    return ti_new, te_new


# ── sources ──────────────────────────────────────────────────────────────


def _volume_element(params: TransportParams, rho: jnp.ndarray) -> jnp.ndarray:
    """dV = 4 pi^2 R0 kappa a^2 rho drho (``runtime_physics.py:96-137``)."""
    return (4.0 * jnp.pi**2 * params.r0 * params.kappa
            * params.a_minor**2 * rho * params.drho)


def _aux_heating(params: TransportParams, p_aux_mw, ne, rho):
    """Gaussian-deposition aux heating, returns (S_i, S_e) in keV/s."""
    shape = jnp.exp(-(jnp.clip(rho, 0.0, 1.0) ** 2)
                    / max(params.aux_heating_profile_width, 1e-6))
    d_v = _volume_element(params, rho)
    norm = jnp.maximum(jnp.sum(shape * d_v), 1e-30)
    ne_safe = jnp.clip(ne, 0.1, 1e3) * 1e19
    e_frac = params.aux_heating_electron_fraction if params.multi_ion else 0.0
    p_w = jnp.maximum(p_aux_mw, 0.0) * 1e6
    p_i = (1.0 - e_frac) * p_w * shape / norm
    p_e = e_frac * p_w * shape / norm
    s_i = (2.0 / 3.0) * p_i / (ne_safe * E_KEV_J)
    s_e = (2.0 / 3.0) * p_e / (ne_safe * E_KEV_J)
    return s_i, s_e


def _confinement_time_estimate(params: TransportParams, s: TransportState,
                               p_aux_mw, rho):
    """tau_E for the He-pump timescale.

    Default: the IPB98(y,2) scaling chain on volume-averaged density and
    loss power (reference ``scaling_laws.py:222-324`` driving
    ``tau_He = f * tau_E``); opt-out: the stored-energy/power estimate.
    """
    d_v = _volume_element(params, rho)
    if params.use_ipb98_tau_he:
        from scpn_fusion_tpu.models.physics.scaling_burn import ipb98y2_tau_e

        vol = jnp.maximum(jnp.sum(d_v), 1e-30)
        ne_avg = jnp.clip(jnp.sum(s.ne * d_v) / vol, 0.1, 1e3)
        # Loss power = aux + alpha heating (alpha from the DT rate).
        sigmav = bosch_hale_sigmav(s.ti)
        p_alpha_w = jnp.sum((s.n_d * s.n_t * sigmav) * 1e38
                            * (3.52e3 * E_KEV_J) * d_v)
        p_loss_mw = jnp.clip(p_aux_mw + p_alpha_w / 1e6, 0.5, 1e4)
        tau = ipb98y2_tau_e(
            jnp.asarray(params.ip_ma, s.ti.dtype), params.b0, ne_avg,
            p_loss_mw, params.r0, params.kappa,
            params.a_minor / params.r0)
        return jnp.clip(tau, 0.05, 50.0)
    w_j = 1.5 * jnp.sum((s.ne * 1e19) * (s.ti + s.te) * E_KEV_J * d_v)
    p_w = jnp.maximum(p_aux_mw, 0.1) * 1e6
    return jnp.clip(w_j / p_w, 0.05, 50.0)


def _evolve_species(params: TransportParams, s: TransportState, dt,
                    p_aux_mw, rho, drho):
    """D/T burn, He ash with pump, quasi-neutral ne, Z_eff, line radiation."""
    sigmav = bosch_hale_sigmav(s.ti)
    # 1e19-normalised burn rate (SI n_d*n_t ~ 1e39 overflows f32).
    s_fuel = (s.n_d * s.n_t * sigmav) * 1e19   # [1e19 m^-3 / s]
    s_he = s_fuel

    tau_e = _confinement_time_estimate(params, s, p_aux_mw, rho)
    tau_he = jnp.maximum(params.tau_he_factor * tau_e, 0.5)
    pump = 1.0 / tau_he

    d_prof = params.d_species * jnp.ones_like(rho)
    a, b, c = build_cn_tridiag(d_prof, dt, rho, drho)

    def species_cn(n_old, source, edge, floor):
        lh = explicit_diffusion_rhs(n_old, d_prof, rho, drho)
        rhs = n_old + 0.5 * dt * lh + dt * source
        n_new = thomas_solve(a, b, c, rhs)
        n_new = n_new.at[0].set(n_new[1]).at[-1].set(edge)
        return jnp.maximum(floor, jnp.where(jnp.isfinite(n_new), n_new, n_old))

    n_d = species_cn(s.n_d, -s_fuel, 0.01, 0.001)
    n_t = species_cn(s.n_t, -s_fuel, 0.01, 0.001)
    n_he = species_cn(s.n_he, s_he - pump * s.n_he, 0.0, 0.0)

    te_safe = jnp.clip(s.te, 0.1, 1e3)
    z_w = jnp.clip(15.0 + 12.0 * jnp.log10(te_safe), 10.0, 50.0)
    n_imp = jnp.maximum(s.n_imp, 0.0)
    ne = jnp.maximum(n_d + n_t + 2.0 * n_he + z_w * n_imp, 0.1)

    ne_m3 = jnp.maximum(ne * 1e19, 1e10)
    sum_nz2 = (n_d * 1e19 + n_t * 1e19 + n_he * 1e19 * 4.0
               + n_imp * 1e19 * z_w**2)
    z_eff = jnp.clip(jnp.mean(sum_nz2 / ne_m3), 1.0, 10.0)

    lz = tungsten_radiation_rate(s.te)
    # f32-safe ordering: (ne19 * n_imp19) ~ 1e2, then one 1e38-folded factor.
    p_rad_line = (ne * n_imp) * (lz * 1e38)
    return s._replace(n_d=n_d, n_t=n_t, n_he=n_he, ne=ne,
                      z_eff=z_eff), p_rad_line


_M_PROTON = 1.67262192369e-27
_E_CHARGE = 1.602176634e-19


def _local_surrogate_inputs(params: TransportParams, s: TransportState,
                            rho: jnp.ndarray) -> jnp.ndarray:
    """(nr, 7) local dimensionless inputs [R/L_Ti, R/L_Te, R/L_ne, q,
    s_hat, Te/Ti, nu_star] for the neural closure (the committed
    artifact's input convention, ``surrogates/pretrained.py``)."""
    inv_scale = params.r0 / params.a_minor

    def r_l(x):
        grad = jnp.gradient(x, params.drho)
        return jnp.clip(-inv_scale * grad / jnp.maximum(x, 1e-2), 0.0, 20.0)

    dq = jnp.gradient(s.q, params.drho)
    s_hat = jnp.clip(rho * dq / jnp.maximum(s.q, 0.2), -1.0, 4.0)
    te_ti = jnp.clip(s.te / jnp.maximum(s.ti, 1e-2), 0.05, 10.0)
    eps = jnp.maximum(rho * params.a_minor / params.r0, 1e-3)
    # Banana-regime electron collisionality nu*_e =
    # 6.9e-18 q R n_e Z_eff lnL / (T_e[eV]^2 eps^1.5); with n_e in
    # 1e19 m^-3, T_e in keV and lnL = 17 the coefficient folds to 0.02.
    nu_star = jnp.clip(
        0.02 * s.ne * s.q * params.r0 * s.z_eff
        / (jnp.maximum(s.te, 0.05) ** 2 * eps**1.5), 1e-3, 1e2)
    return jnp.stack([r_l(s.ti), r_l(s.te), r_l(s.ne),
                      s.q, s_hat, te_ti,
                      jnp.broadcast_to(nu_star, rho.shape)], axis=1)


def _gyro_bohm_unit(params: TransportParams, ti_kev: jnp.ndarray):
    """chi_gB = rho_s^2 c_s / a per radial point [m^2/s]."""
    m_i = params.a_ion * _M_PROTON
    t_j = jnp.maximum(ti_kev, 0.01) * E_KEV_J
    c_s = jnp.sqrt(t_j / m_i)
    rho_s = m_i * c_s / (_E_CHARGE * params.b0)
    return rho_s**2 * c_s / params.a_minor


def _transport_coefficients(params: TransportParams, s: TransportState,
                            surrogate=None):
    """chi closures on the current state.

    Analytic lane: Chang-Hinton base + gyro-Bohm turbulent channel (the
    reference's default reduced-multichannel shape).  With ``surrogate``
    (a ``TransportSurrogate`` pytree): neural fluxes per radial point,
    falling back to the analytic closure wherever the point's max |z|
    against the training envelope exceeds ``params.ood_sigma`` — the
    reference's OOD-index selection inside the transport loop
    (``integrated_transport_solver_model.py:83-160``) with the analytic
    closure playing the escalation target."""
    rho = params.rho(s.ti.dtype)
    chi_nc = chang_hinton_chi(rho, s.ti, s.ne, s.q, params.r0,
                              params.a_minor, params.b0,
                              params.a_ion, s.z_eff)
    chi_gb = gyro_bohm_chi(s.ti, s.te, s.q, params.r0, params.a_minor,
                           params.b0, params.a_ion, params.c_gb)
    chi_e = jnp.maximum(chi_nc + chi_gb, 1e-6)
    chi_i = jnp.maximum(chi_nc + chi_gb, 1e-6)
    d_n = jnp.maximum(0.5 * chi_gb, 0.1 * chi_nc)

    if surrogate is not None:
        x = _local_surrogate_inputs(params, s, rho)
        y_gb = surrogate.fluxes_gb(x)              # (nr, 3) gyro-Bohm
        unit = _gyro_bohm_unit(params, s.ti)
        ood = surrogate.max_abs_z(x) > params.ood_sigma
        pick = lambda nn, an: jnp.where(ood, an, jnp.maximum(nn, 1e-6))  # noqa: E731
        chi_i = pick(y_gb[:, 0] * unit, chi_i)
        chi_e = pick(y_gb[:, 1] * unit, chi_e)
        d_n = pick(y_gb[:, 2] * unit, d_n)

    clip = lambda x: jnp.clip(x, 0.01, 1e4)  # noqa: E731
    return clip(chi_e), clip(chi_i), jnp.clip(d_n, 0.0, 1e4)


# ── one full step ────────────────────────────────────────────────────────


@partial(jax.jit, static_argnames=("params",))
def evolve_profiles(
    s: TransportState,
    dt: jnp.ndarray,
    p_aux_mw: jnp.ndarray,
    params: TransportParams,
    surrogate=None,
) -> TransportState:
    """Advance the transport state by one CN step (reference
    ``evolve_profiles``, ``runtime.py:294-530``).  ``surrogate`` (optional
    ``TransportSurrogate`` pytree) switches the chi closure to the neural
    lane with per-point OOD fallback."""
    dtype = s.ti.dtype
    rho = params.rho(dtype)
    drho = params.drho
    ti_old, te_old = s.ti, s.te

    if params.multi_ion:
        s, p_rad_line = _evolve_species(params, s, dt, p_aux_mw, rho, drho)
    else:
        p_rad_line = jnp.zeros_like(rho)

    s_heat_i, s_heat_e = _aux_heating(params, p_aux_mw, s.ne, rho)

    if params.multi_ion:
        ne_safe = jnp.maximum(s.ne, 0.1) * 1e19
        s_rad_i = p_rad_line / (ne_safe * E_KEV_J) * 0.5
        tau_eq = jnp.clip(0.01 * te_old**1.5 / jnp.maximum(s.ne / 10.0, 0.1),
                          0.001, 1.0)
        nu_eq = 1.0 / tau_eq
    else:
        s_rad_i = 5.0 * s.ne * s.n_imp * jnp.sqrt(te_old + 0.1)
        nu_eq = jnp.zeros_like(rho)

    heat_i = jnp.where(jnp.isfinite(s_heat_i), s_heat_i, 0.0)
    nu_rad_i = jnp.maximum(s_rad_i / jnp.maximum(ti_old, 0.01), 0.0)
    nu_rad_i = jnp.where(jnp.isfinite(nu_rad_i), nu_rad_i, 0.0)

    def thermal(chi_i, chi_e, state):
        return _thermal_cn_step(
            params, dt, ti_old, te_old, chi_i, chi_e, heat_i, nu_rad_i,
            nu_eq, s_heat_e, p_rad_line, state.ne, state.z_eff, rho, drho)

    # Predictor with beginning-of-step coefficients.
    chi_i_n, chi_e_n, d_n_n = s.chi_i, s.chi_e, s.d_n
    ti_p, te_p = thermal(chi_i_n, chi_e_n, s)

    # Picard corrector on the nonlinear chi closure (``runtime.py:417-500``):
    # theta-centred target, damped after the first iteration, re-solving the
    # thermal step from the frozen beginning-of-step state each time.
    theta = params.picard_theta
    damping = params.picard_damping

    def body(carry):
        k, ti_c, te_c, chi_i_c, chi_e_c, d_n_c, _ = carry
        trial = s._replace(ti=ti_c, te=te_c)
        chi_e_pred, chi_i_pred, d_n_pred = _transport_coefficients(
            params, trial, surrogate)
        chi_i_t = (1.0 - theta) * chi_i_n + theta * chi_i_pred
        chi_e_t = (1.0 - theta) * chi_e_n + theta * chi_e_pred
        d_n_t = (1.0 - theta) * d_n_n + theta * d_n_pred
        first = k == 0
        blend = jnp.where(first, 1.0, damping)
        chi_i_new = chi_i_c + blend * (chi_i_t - chi_i_c)
        chi_e_new = chi_e_c + blend * (chi_e_t - chi_e_c)
        d_n_new = d_n_c + blend * (d_n_t - d_n_c)
        ti_new, te_new = thermal(chi_i_new, chi_e_new, trial)
        resid = jnp.maximum(
            jnp.linalg.norm(ti_new - ti_c) / jnp.maximum(jnp.linalg.norm(ti_c), 1e-30),
            jnp.linalg.norm(te_new - te_c) / jnp.maximum(jnp.linalg.norm(te_c), 1e-30))
        return (k + 1, ti_new, te_new, chi_i_new, chi_e_new, d_n_new, resid)

    def cond(carry):
        k, *_, resid = carry
        return (k < params.picard_max_iter) & (resid > params.picard_tol)

    init = (jnp.int32(0), ti_p, te_p, chi_i_n, chi_e_n, d_n_n,
            jnp.asarray(jnp.inf, dtype))
    _, ti_f, te_f, chi_i_f, chi_e_f, d_n_f, _ = jax.lax.while_loop(
        cond, body, init)

    return s._replace(ti=ti_f, te=te_f, chi_i=chi_i_f, chi_e=chi_e_f, d_n=d_n_f)


@partial(jax.jit, static_argnames=("params", "n_steps"))
def run_transport(
    s: TransportState,
    dt: jnp.ndarray,
    p_aux_mw: jnp.ndarray,
    params: TransportParams,
    n_steps: int,
    surrogate=None,
) -> tuple[TransportState, dict]:
    """Run ``n_steps`` transport steps under ``lax.scan``, returning the
    final state and per-step core-temperature traces."""
    def step(state, _):
        new = evolve_profiles(state, dt, p_aux_mw, params, surrogate)
        return new, {"ti0": new.ti[1], "te0": new.te[1],
                     "ne0": new.ne[1], "n_he0": new.n_he[1]}

    return jax.lax.scan(step, s, None, length=n_steps)
