"""Confinement scaling, 0D burn physics, and breeding-blanket neutronics.

JAX ports of three reference lanes:

* IPB98(y,2) energy-confinement scaling (``core/scaling_laws.py:222-324``)
  with the published ITER Physics Basis coefficients
  (``validation/reference_data/itpa/ipb98y2_coefficients.json``;
  NF 39 (1999) 2175) and the H-factor helper.
* 0D burn equilibrium / Q scan (``core/fusion_ignition_sim.py`` lane;
  RESULTS.md "Q>=10 operating point": Q = 15, P_fus 1564 MW): steady-state
  power balance  P_aux + P_alpha = W / tau_E(IPB98)  solved as a jittable
  fixed point over temperature, with Bosch-Hale reactivity.
* 1D cylindrical breeding-blanket neutronics
  (``nuclear/blanket_neutronics.py:54-193``): diffusion-reaction equation
  with Li-6 capture / Be multiplication closure, solved with the Thomas
  kernel, TBR from the cylindrical production integral (RESULTS: TBR 1.141
  at 90 % Li-6, 80-100 cm).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.models.transport.closures import bosch_hale_sigmav
from scpn_fusion_tpu.ops.tridiag import thomas_solve

# Published IPB98(y,2) coefficients — ITER Physics Basis, NF 39 (1999) 2175.
IPB98Y2_C = 0.0562
IPB98Y2_EXP = {
    "ip_ma": 0.93, "bt_t": 0.15, "ne19": 0.41, "ploss_mw": -0.69,
    "r_m": 1.97, "kappa": 0.78, "epsilon": 0.58, "m_amu": 0.19,
}
E_FUSION_J = 17.6e6 * 1.602176634e-19     # D-T fusion energy
E_ALPHA_J = 3.52e6 * 1.602176634e-19      # alpha-particle share
E_KEV_J = 1.602176634e-16


def ipb98y2_tau_e(ip_ma, bt_t, ne19, ploss_mw, r_m, kappa, epsilon,
                  m_amu=2.5):
    """IPB98(y,2) thermal confinement time [s] (jnp, differentiable)."""
    e = IPB98Y2_EXP
    return (IPB98Y2_C
            * ip_ma ** e["ip_ma"] * bt_t ** e["bt_t"] * ne19 ** e["ne19"]
            * ploss_mw ** e["ploss_mw"] * r_m ** e["r_m"]
            * kappa ** e["kappa"] * epsilon ** e["epsilon"]
            * m_amu ** e["m_amu"])


def h_factor(tau_actual, tau_predicted):
    """H98 = tau_actual / tau_IPB98 (reference ``compute_h_factor``)."""
    return tau_actual / jnp.maximum(tau_predicted, 1e-30)


class BurnPoint(NamedTuple):
    q_fusion: jnp.ndarray        # P_fus / P_aux
    p_fusion_mw: jnp.ndarray
    p_alpha_mw: jnp.ndarray
    tau_e_s: jnp.ndarray
    t_kev: jnp.ndarray           # converged volume-average temperature
    converged: jnp.ndarray


@partial(jax.jit, static_argnames=("n_iter",))
def burn_equilibrium_0d(
    *,
    ne19,
    p_aux_mw,
    ip_ma,
    bt_t,
    r_m,
    a_m,
    kappa,
    t_init_kev=8.0,
    dilution=0.8,          # fuel-ion fraction n_DT / n_e
    f_profile=2.0,         # peaking factor for <sigma v> averaging
    n_iter: int = 200,
) -> BurnPoint:
    """0D steady-state burn point: relax T until power balance closes.

    W = 3 n T V;  P_loss = W / tau_E(IPB98);  balance P_aux + P_alpha = P_loss.
    Temperature is relaxed toward the balance fixed point (damped iteration,
    jittable) — the reference's 0D scan lane.
    """
    volume = 2.0 * jnp.pi**2 * r_m * a_m**2 * kappa
    epsilon = a_m / r_m
    # All density arithmetic stays in 1e19 units so intermediates fit f32
    # (n^2 in SI is ~1e39, above the f32 range).
    n_fuel19 = dilution * ne19
    # 1e38 (from n19^2) * E_FUSION_J folded into one f32-safe constant:
    fus_const_mw = 1e38 * E_FUSION_J / 1e6         # ~2.8e26 -> times sigmav ~1e-22

    def p_fus_mw_at(t_kev):
        t = jnp.clip(t_kev, 0.5, 100.0)
        sigmav = bosch_hale_sigmav(f_profile * t) / f_profile
        n_d19 = 0.5 * n_fuel19
        return (n_d19 * n_d19) * (sigmav * fus_const_mw) * volume

    # W/T coefficient in 1e19-scaled units: 3 n_e T V e -> MW s / keV.
    w_coeff_mw_per_kev = 3.0 * ne19 * (1e19 * E_KEV_J / 1e6) * volume

    def body(_, t_kev):
        p_alpha_mw = p_fus_mw_at(t_kev) / 5.0
        p_heat = p_aux_mw + p_alpha_mw
        tau = ipb98y2_tau_e(ip_ma, bt_t, ne19, jnp.maximum(p_heat, 1.0),
                            r_m, kappa, epsilon)
        # Energy balance temperature: W = P_heat * tau = 3 n T V
        t_balance = p_heat * tau / w_coeff_mw_per_kev
        return t_kev + 0.3 * (t_balance - t_kev)

    t_final = jax.lax.fori_loop(0, n_iter, body, jnp.asarray(t_init_kev))
    t = jnp.clip(t_final, 0.5, 100.0)
    p_fus_mw = p_fus_mw_at(t_final)
    p_alpha_mw = p_fus_mw / 5.0
    p_heat = p_aux_mw + p_alpha_mw
    tau = ipb98y2_tau_e(ip_ma, bt_t, ne19, jnp.maximum(p_heat, 1.0),
                        r_m, kappa, epsilon)
    t_balance = p_heat * tau / w_coeff_mw_per_kev
    return BurnPoint(
        q_fusion=p_fus_mw / jnp.maximum(p_aux_mw, 1e-6),
        p_fusion_mw=p_fus_mw,
        p_alpha_mw=p_alpha_mw,
        tau_e_s=tau,
        t_kev=t,
        converged=jnp.abs(t_balance - t_final) < 0.05 * jnp.abs(t_final),
    )


class BlanketResult(NamedTuple):
    r_cm: jnp.ndarray
    flux: jnp.ndarray
    tbr: jnp.ndarray
    production_rate: jnp.ndarray


@partial(jax.jit, static_argnames=("n_points",))
def blanket_tbr(
    *,
    thickness_cm=100.0,
    li6_enrichment=0.9,
    r_inner_cm=200.0,
    incident_flux=1e14,
    rear_albedo=0.0,
    n_points: int = 100,
) -> BlanketResult:
    """1D cylindrical neutron diffusion + TBR (reference semantics).

    -D (1/r) d/dr(r dPhi/dr) + Sigma_rem Phi = 0,  Dirichlet first wall,
    albedo back wall; Sigma set by the reference's reduced-order 14 MeV
    closure (Li-6 capture 0.15 * enrichment, scatter 0.2, parasitic 0.02,
    Be (n,2n) 0.08 with gain 1.8).
    """
    sig_li6 = 0.15 * li6_enrichment
    sig_scatter = 0.2
    sig_parasitic = 0.02
    sig_multiply = 0.08
    gain = 1.8

    sigma_total = sig_li6 + sig_scatter + sig_parasitic + sig_multiply
    d_coeff = 1.0 / (3.0 * sigma_total)
    sigma_removal = sig_li6 + sig_parasitic - sig_multiply * (gain - 1.0)

    r = jnp.linspace(r_inner_cm, r_inner_cm + thickness_cm, n_points)
    dr = r[1] - r[0]

    r_int = r[1:-1]
    c_plus = d_coeff * (r_int + 0.5 * dr) / (r_int * dr**2)
    c_minus = d_coeff * (r_int - 0.5 * dr) / (r_int * dr**2)

    # Tridiagonal system rows 0..n-1 (Dirichlet front, albedo back).
    a = jnp.zeros((n_points - 1,))
    b = jnp.ones((n_points,))
    c = jnp.zeros((n_points - 1,))
    rhs = jnp.zeros((n_points,))
    a = a.at[:-1].set(-c_minus)
    b = b.at[1:-1].set(c_plus + c_minus + sigma_removal)
    c = c.at[1:].set(-c_plus)
    rhs = rhs.at[0].set(incident_flux)
    a = a.at[-1].set(-rear_albedo)

    phi = thomas_solve(a, b, c, rhs)
    phi = jnp.maximum(phi, 0.0)

    production = sig_li6 * phi
    integrand = production * 2.0 * jnp.pi * r
    total_production = jnp.sum(0.5 * (integrand[1:] + integrand[:-1]) * dr)
    incident_current = (phi[0] / 4.0) * (2.0 * jnp.pi * r_inner_cm)
    tbr = total_production / jnp.maximum(incident_current, 1e-12)
    return BlanketResult(r, phi, tbr, production)
