"""Disruption sequence: thermal quench -> current quench -> runaways,
halo currents, SPI mitigation, structural response.

Role-parity with the reference's disruption chain
(``core/disruption_sequence.py`` staged TQ/CQ/RE simulation,
``control/spi_mitigation.py:24`` shattered-pellet mitigation,
``control/halo_re_physics.py`` halo-current fractions,
``core/disruption_structural_response.py`` vessel force screen; the
kinetic RE tail lives in ``models/physics/fokker_planck_re.py``).

One ``lax.scan`` integrates the whole sequence (Te collapse on tau_TQ,
L/R current decay with cold-plasma Spitzer resistivity, Rosenbluth-
Putvinski avalanche growth of the RE current against the critical field),
so mitigation scans (SPI quantity/timing sweeps) are ``vmap``s over the
sequence.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

MU0 = 4.0e-7 * jnp.pi
E_CHARGE = 1.602176634e-19
M_E = 9.109e-31
C_LIGHT = 2.998e8
LN_LAMBDA = 15.0


@dataclasses.dataclass(frozen=True)
class DisruptionParams:
    ip0_ma: float = 15.0
    te0_kev: float = 10.0
    te_post_tq_ev: float = 10.0       # post-thermal-quench temperature
    ne20: float = 1.0                 # pre-disruption density
    r0_m: float = 6.2
    a_m: float = 2.0
    kappa: float = 1.8
    l_plasma_uh: float = 7.0
    tau_tq_ms: float = 1.0
    re_seed_fraction: float = 1e-9    # seed RE current fraction of Ip
    halo_fraction_max: float = 0.35
    tpf: float = 2.0                  # toroidal peaking factor
    dt_ms: float = 0.05
    n_steps: int = 4000


def spitzer_resistivity(te_ev, z_eff=1.5):
    """Spitzer eta [ohm m] for the cold post-TQ plasma."""
    return 5.2e-5 * z_eff * LN_LAMBDA / jnp.maximum(te_ev, 1.0) ** 1.5


# E_c / (ne20 lnLambda) precomputed in f64:
#   e^3 / (4 pi eps0^2 m_e c^2) * 1e20  [V/m per 1e20 m^-3 per lnLambda]
# (evaluating the raw e^3 product underflows f32 on device).
_EC_PER_NE20_LNL = 5.0990991e-3


def critical_field_connor_hastie(ne20):
    """Connor-Hastie critical field E_c [V/m] for RE sustainment
    (f32-safe constant-folded form)."""
    return jnp.maximum(ne20, 1e-6) * LN_LAMBDA * _EC_PER_NE20_LNL


def avalanche_growth_rate(e_par, ne20):
    """Rosenbluth-Putvinski avalanche rate ~ (E/E_c - 1)/tau_av [1/s]."""
    e_c = critical_field_connor_hastie(ne20)
    tau_av = (M_E * C_LIGHT * LN_LAMBDA
              / jnp.maximum(e_c, 1e-12) / E_CHARGE) / 2.0
    return jnp.maximum(e_par / jnp.maximum(e_c, 1e-12) - 1.0, 0.0) / tau_av


class DisruptionTrace(NamedTuple):
    t_ms: jnp.ndarray
    te_ev: jnp.ndarray
    ip_ma: jnp.ndarray          # ohmic (thermal-channel) current
    i_re_ma: jnp.ndarray        # runaway current
    e_par_v_m: jnp.ndarray
    halo_ma: jnp.ndarray


class DisruptionSummary(NamedTuple):
    tau_cq_ms: jnp.ndarray      # 80-20 current-quench time
    i_re_final_ma: jnp.ndarray
    halo_peak_ma: jnp.ndarray
    halo_force_mn: jnp.ndarray  # vertical force proxy (with TPF)
    mitigated: jnp.ndarray      # RE current below 1% of Ip0


def run_disruption_sequence(p: DisruptionParams, *,
                            spi_ne20_injected: float = 0.0,
                            spi_time_ms: float = 0.0
                            ) -> tuple[DisruptionTrace, DisruptionSummary]:
    """Integrate the staged disruption.

    SPI raises the density (and hence E_c) at ``spi_time_ms``; a large
    enough injected inventory suppresses the avalanche (the reference's
    mitigation criterion).
    """
    dt = p.dt_ms * 1e-3
    area = jnp.pi * p.a_m ** 2 * p.kappa
    l_p = p.l_plasma_uh * 1e-6

    def step(carry, k):
        te, ip_a, i_re_a = carry
        t_ms = k * p.dt_ms
        # Thermal quench: exponential Te collapse to the post-TQ floor.
        te1 = p.te_post_tq_ev + (p.te0_kev * 1e3 - p.te_post_tq_ev) \
            * jnp.exp(-t_ms / p.tau_tq_ms)
        # Density: SPI delivery is a step at spi_time_ms.
        ne20 = p.ne20 + spi_ne20_injected * (t_ms >= spi_time_ms)
        # Current quench: L dI/dt = -R I, R from cold Spitzer resistivity.
        eta = spitzer_resistivity(te1)
        r_plasma = eta * 2.0 * jnp.pi * p.r0_m / area
        e_par = r_plasma * (ip_a - i_re_a) / (2.0 * jnp.pi * p.r0_m)
        dip = -r_plasma * (ip_a - i_re_a) / l_p
        # RE avalanche on the same loop field.
        gamma = avalanche_growth_rate(e_par, ne20)
        seed = p.re_seed_fraction * p.ip0_ma * 1e6 / (p.n_steps * dt)
        di_re = gamma * i_re_a + seed * (te1 < 100.0)
        ip1 = jnp.maximum(ip_a + dt * dip, 0.0)
        i_re1 = jnp.minimum(i_re_a + dt * di_re, ip1)
        # Halo current: grows as the thermal current decays.
        lost = 1.0 - ip1 / (p.ip0_ma * 1e6)
        halo = p.halo_fraction_max * lost * ip1
        return ((te1, ip1, i_re1),
                (t_ms, te1, ip1 / 1e6, i_re1 / 1e6, e_par, halo / 1e6))

    init = (jnp.asarray(p.te0_kev * 1e3), jnp.asarray(p.ip0_ma * 1e6),
            jnp.asarray(0.0))
    _, (t_ms, te, ip_ma, i_re_ma, e_par, halo_ma) = jax.lax.scan(
        step, init, jnp.arange(p.n_steps))

    # 80-20 current-quench time (linear extrapolation convention).
    ip0 = p.ip0_ma
    t80 = t_ms[jnp.argmax(ip_ma < 0.8 * ip0)]
    below20 = ip_ma < 0.2 * ip0
    t20 = jnp.where(jnp.any(below20), t_ms[jnp.argmax(below20)],
                    t_ms[-1])
    tau_cq = (t20 - t80) / 0.6

    halo_peak = jnp.max(halo_ma)
    # Vertical force proxy: F ~ TPF * I_halo * B_pol * 2 pi R
    b_pol = MU0 * p.ip0_ma * 1e6 / (2.0 * jnp.pi * p.a_m)
    force_mn = p.tpf * halo_peak * 1e6 * b_pol * 2.0 * jnp.pi \
        * p.r0_m / 1e6

    trace = DisruptionTrace(t_ms=t_ms, te_ev=te, ip_ma=ip_ma,
                            i_re_ma=i_re_ma, e_par_v_m=e_par,
                            halo_ma=halo_ma)
    summary = DisruptionSummary(
        tau_cq_ms=tau_cq, i_re_final_ma=i_re_ma[-1],
        halo_peak_ma=halo_peak, halo_force_mn=force_mn,
        mitigated=i_re_ma[-1] < 0.01 * p.ip0_ma)
    return trace, summary


def spi_mitigation_scan(p: DisruptionParams, quantities_ne20: jnp.ndarray,
                        *, spi_time_ms: float = 0.5):
    """vmap the sequence over SPI inventories; returns summaries
    (reference ``spi_mitigation.py`` planning scan)."""
    def one(q):
        _, s = run_disruption_sequence(p, spi_ne20_injected=q,
                                       spi_time_ms=spi_time_ms)
        return s

    return jax.vmap(one)(quantities_ne20)


def structural_response_screen(summary: DisruptionSummary, *,
                               force_limit_mn: float = 80.0,
                               tau_cq_min_ms: float = 1.5):
    """Fail-closed vessel screen (reference
    ``disruption_structural_response.py`` contract): halo force within the
    design limit and the current quench not faster than the eddy-load
    design basis."""
    failures = []
    if float(summary.halo_force_mn) > force_limit_mn:
        failures.append("halo_force_limit")
    if float(summary.tau_cq_ms) < tau_cq_min_ms:
        failures.append("current_quench_too_fast")
    return {"passed": not failures, "failures": failures,
            "halo_force_mn": float(summary.halo_force_mn),
            "tau_cq_ms": float(summary.tau_cq_ms)}
