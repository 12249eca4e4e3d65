"""Integrated shot scenario: waveforms -> confinement -> burn -> flux budget.

Role-parity with the reference's scenario integration
(``core/integrated_scenario.py`` whole-shot simulation coupling the ramp
schedule, confinement scaling, burn physics, and operational limits;
``core/fusion_ignition_sim.py`` / ``core/dynamic_burn_model.py`` dW/dt
energy balance).

One ``lax.scan`` over control ticks composes the framework pieces:

* the breakpoint :class:`~scpn_fusion_tpu.control.scenario.ScenarioSchedule`
  provides Ip/density/heating waveforms,
* the Martin-2008 L-H state machine switches the H98 factor,
* the plasma energy integrates dW/dt = P_aux + P_alpha - P_rad - W/tau_E
  with IPB98(y,2) tau_E (a DYNAMIC burn, not the instant 0D fixed point),
* Ejima flux consumption runs alongside and flags budget exhaustion,
* Greenwald/beta operational limits are monitored per tick.

The whole shot is one compiled program; parameter scans vmap over it.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.control.scenario import FluxBudget, ScenarioSchedule
from scpn_fusion_tpu.models.physics.scaling_burn import (
    bosch_hale_sigmav,
    ipb98y2_tau_e,
)
from scpn_fusion_tpu.models.transport.momentum_lh import (
    confinement_multiplier,
    lh_transition_step,
)

E_KEV_J = 1.602176634e-16
E_FUSION_J = 17.6e6 * 1.602176634e-19


@dataclasses.dataclass(frozen=True)
class ScenarioMachine:
    r_m: float = 6.2
    a_m: float = 2.0
    kappa: float = 1.8
    b0_t: float = 5.3
    dilution: float = 0.8
    f_profile: float = 2.0
    rad_fraction: float = 0.3     # radiated fraction of heating power
    loop_voltage_v: float = 0.08  # flattop loop voltage
    bootstrap_fraction: float = 0.3
    t_init_kev: float = 0.5


class ShotTrace(NamedTuple):
    t_s: jnp.ndarray
    ip_ma: jnp.ndarray
    ne19: jnp.ndarray
    p_aux_mw: jnp.ndarray
    t_kev: jnp.ndarray
    w_mj: jnp.ndarray
    p_fusion_mw: jnp.ndarray
    q_fusion: jnp.ndarray
    h_mode: jnp.ndarray
    tau_e_s: jnp.ndarray
    flux_remaining_vs: jnp.ndarray
    greenwald_fraction: jnp.ndarray


class ShotReport(NamedTuple):
    q_flattop: jnp.ndarray         # mean Q during the flattop window
    p_fusion_peak_mw: jnp.ndarray
    h_mode_duration_s: jnp.ndarray
    flux_exhausted: jnp.ndarray
    greenwald_violated: jnp.ndarray
    reached_burn: jnp.ndarray      # Q >= 5 sustained at flattop


def _fusion_power_mw(m: ScenarioMachine, ne19, t_kev):
    volume = 2.0 * jnp.pi ** 2 * m.r_m * m.a_m ** 2 * m.kappa
    n_fuel19 = m.dilution * ne19
    t = jnp.clip(t_kev, 0.3, 100.0)
    sigmav = bosch_hale_sigmav(m.f_profile * t) / m.f_profile
    fus_const_mw = 1e38 * E_FUSION_J / 1e6
    n_d19 = 0.5 * n_fuel19
    return (n_d19 * n_d19) * (sigmav * fus_const_mw) * volume


def run_shot(schedule: ScenarioSchedule, budget: FluxBudget,
             m: ScenarioMachine = ScenarioMachine(), *,
             dt_s: float = 0.5) -> tuple[ShotTrace, ShotReport]:
    """Integrate the whole shot (reference ``integrated_scenario`` role)."""
    n_steps = int(schedule.duration / dt_s)
    times = jnp.arange(n_steps) * dt_s
    wf = schedule.evaluate(times)     # arrays over the full shot
    ip_tr = wf["ip_ma"]
    ne_tr = wf["ne19"]
    paux_tr = wf["p_aux_mw"]

    volume = 2.0 * jnp.pi ** 2 * m.r_m * m.a_m ** 2 * m.kappa
    eps = m.a_m / m.r_m

    def tick(carry, k):
        w_mj, h_mode, flux_used = carry
        ip = jnp.maximum(ip_tr[k], 0.1)
        ne = jnp.maximum(ne_tr[k], 0.1)
        p_aux = paux_tr[k]

        # temperature from stored energy: W = 3 n T V
        w_coeff = 3.0 * ne * (1e19 * E_KEV_J / 1e6) * volume  # MJ per keV
        t_kev = jnp.clip(w_mj / jnp.maximum(w_coeff, 1e-9), 0.05, 100.0)

        p_fus = _fusion_power_mw(m, ne, t_kev)
        p_alpha = p_fus / 5.0
        p_heat = p_aux + p_alpha
        p_net = (1.0 - m.rad_fraction) * p_heat

        # L-H margin compares the power crossing the separatrix (the
        # Martin scaling's definition uses total loss power, not the
        # radiation-corrected core heating).
        lh = lh_transition_step(p_heat, ne / 10.0, m.b0_t, m.r_m, m.a_m,
                                m.kappa, h_mode)
        h98 = confinement_multiplier(lh.h_mode)
        tau = h98 * ipb98y2_tau_e(ip, m.b0_t, ne,
                                  jnp.maximum(p_net, 0.5),
                                  m.r_m, m.kappa, eps)
        dw = p_net - w_mj / jnp.maximum(tau, 1e-3)
        w1 = jnp.maximum(w_mj + dt_s * dw, 0.01)

        # Flux consumption: resistive V-s during the whole shot
        v_loop = m.loop_voltage_v * (1.0 - m.bootstrap_fraction)
        flux_used1 = flux_used + v_loop * dt_s
        remaining = (budget.phi_cs_vs - budget.inductive_flux(ip)
                     - flux_used1)

        n_gw = 10.0 * ip / (jnp.pi * m.a_m ** 2)
        f_gw = ne / jnp.maximum(n_gw, 1e-6)
        q_fus = p_fus / jnp.maximum(p_aux, 0.5)

        out = (times[k], ip, ne, p_aux, t_kev, w1, p_fus, q_fus,
               lh.h_mode, tau, remaining, f_gw)
        return (w1, lh.h_mode, flux_used1), out

    w0 = 3.0 * jnp.maximum(ne_tr[0], 0.1) * (1e19 * E_KEV_J / 1e6) \
        * volume * m.t_init_kev
    init = (w0, jnp.asarray(False), jnp.asarray(0.0))
    _, outs = jax.lax.scan(tick, init, jnp.arange(n_steps))
    trace = ShotTrace(*outs)

    # flattop window = where Ip is within 2% of its maximum
    at_flat = trace.ip_ma > 0.98 * jnp.max(trace.ip_ma)
    n_flat = jnp.maximum(jnp.sum(at_flat), 1)
    q_flat = jnp.sum(jnp.where(at_flat, trace.q_fusion, 0.0)) / n_flat
    report = ShotReport(
        q_flattop=q_flat,
        p_fusion_peak_mw=jnp.max(trace.p_fusion_mw),
        h_mode_duration_s=jnp.sum(trace.h_mode) * dt_s,
        flux_exhausted=jnp.any(trace.flux_remaining_vs < 0.0),
        # The density limit is an operational constraint of the current
        # plateau; below ~1 MA (termination tail) it is not meaningful.
        greenwald_violated=jnp.any((trace.greenwald_fraction > 1.0)
                                   & (trace.ip_ma > 1.0)),
        reached_burn=q_flat >= 5.0)
    return trace, report
