"""Shot scenario machinery: startup, waveform scheduling, volt-second budget.

Role-parity with the reference's startup + scenario lane
(``core/plasma_startup.py:25-340`` Paschen breakdown / Townsend avalanche /
radiative burn-through / StartupSequence / StartupController,
``control/scenario_scheduler.py:28-120`` waveform schedule,
``control/volt_second_manager.py:24-140`` flux budget + consumption
monitor), redesigned traceable:

* Paschen/avalanche/burn-through are jnp functions and ``lax.scan`` loops,
  so prefill-pressure scans and loop-voltage trade studies are ``vmap``s,
* waveforms are breakpoint arrays evaluated with ``jnp.interp`` (the whole
  schedule evaluates at an array of times in one call),
* the volt-second budget uses the Ejima resistive-consumption form and is
  differentiable for ramp optimisation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.core.dtypes import canonical, default_float

MU0 = 4.0e-7 * jnp.pi
E_CHARGE = 1.602176634e-19

# Townsend coefficients for D2 (Lieberman & Lichtenberg 2005 Ch.14 values,
# as used by the reference PaschenBreakdown model).
TOWNSEND_A = 44.7      # 1/(Pa m)
TOWNSEND_C2 = 2.64
TOWNSEND_B = 155.0     # V/(Pa m)


# ---------------------------------------------------------------------------
# Breakdown + avalanche + burn-through
# ---------------------------------------------------------------------------

def paschen_breakdown_voltage(p_pa, connection_length_m=100.0):
    """Paschen V_bd(p L); +inf outside the valid branch (traceable)."""
    pd = jnp.asarray(p_pa) * connection_length_m
    denom = TOWNSEND_A * jnp.log(jnp.maximum(pd, 1e-6)) - TOWNSEND_C2
    v = TOWNSEND_B * pd / jnp.maximum(denom, 1e-12)
    return jnp.where((pd > 0) & (denom > 0), v, jnp.inf)


def optimal_prefill_pressure(connection_length_m=100.0):
    """Paschen-minimum prefill: pd_opt = exp(1 + C2/A)."""
    return float(jnp.exp(1.0 + TOWNSEND_C2 / TOWNSEND_A)
                 / connection_length_m)


def is_breakdown(v_loop, p_pa, connection_length_m=100.0):
    return jnp.asarray(v_loop) > paschen_breakdown_voltage(
        p_pa, connection_length_m)


class AvalancheTrace(NamedTuple):
    ne_m3: jnp.ndarray
    te_ev: jnp.ndarray
    ionization_fraction: jnp.ndarray   # scalar final
    time_to_full_ionization_s: jnp.ndarray  # inf if never


def townsend_avalanche(*, v_loop: float, p_pa: float, r0_m: float,
                       dt: float = 1e-5, n_steps: int = 2000,
                       seed_ne_m3: float = 1e13) -> AvalancheTrace:
    """Seed-electron avalanche to full ionization (reference
    ``TownsendAvalanche.evolve`` :100-140 physics) in one ``lax.scan``."""
    e_par = v_loop / (2.0 * jnp.pi * r0_m)
    n_neutral = p_pa / (1.38e-23 * 300.0)

    def step(carry, k):
        ne, te = carry
        sig_v = 1e-14 * jnp.exp(-13.6 / jnp.maximum(te, 0.1))
        nu_ion = n_neutral * sig_v * (te > 0.1)
        ne1 = jnp.minimum(ne * (1.0 + nu_ion * dt), n_neutral)
        eta = 1e-4 / jnp.maximum(te, 0.1) ** 1.5
        p_ohmic = e_par ** 2 / eta
        p_loss = nu_ion * 13.6 * E_CHARGE * ne
        dte = (p_ohmic - p_loss) * dt / jnp.maximum(ne, 1e-6) / E_CHARGE
        te1 = jnp.clip(te + dte, 0.5, 10.0)
        return (ne1, te1), (ne1, te1)

    init = (jnp.asarray(seed_ne_m3, default_float()),
            jnp.asarray(1.0, default_float()))
    _, (ne_tr, te_tr) = jax.lax.scan(step, init, jnp.arange(n_steps))
    frac = ne_tr[-1] / n_neutral
    full = ne_tr >= 0.99 * n_neutral
    t_full = jnp.where(jnp.any(full),
                       jnp.argmax(full).astype(default_float()) * dt, jnp.inf)
    return AvalancheTrace(ne_m3=ne_tr, te_ev=te_tr,
                          ionization_fraction=frac,
                          time_to_full_ionization_s=t_full)


class BurnThroughTrace(NamedTuple):
    te_ev: jnp.ndarray
    succeeded: jnp.ndarray   # bool: Te cleared the radiation barrier


def burn_through(*, v_loop: float, r0_m: float, a_m: float,
                 ne19: float = 1.0, impurity_fraction: float = 0.01,
                 dt: float = 1e-4, n_steps: int = 3000) -> BurnThroughTrace:
    """0D ohmic-heating vs line-radiation barrier (reference
    ``BurnThrough.evolve`` :214-256 contract: success = Te rises through
    the low-Z radiation peak around a few eV)."""
    ne = ne19 * 1e19

    def step(te, _):
        # Spitzer-like resistivity (eta ~ Te^-3/2), loop-driven current
        eta = 1.65e-9 * 15.0 / jnp.maximum(te / 1e3, 1e-4) ** 1.5  # Te in eV
        e_par = v_loop / (2.0 * jnp.pi * r0_m)
        p_ohmic = e_par ** 2 / eta                                 # W/m^3
        # Low-Z line-radiation barrier: peaked near 10 eV
        lz = 1e-33 * jnp.exp(-((jnp.log(jnp.maximum(te, 0.5) / 10.0)) ** 2))
        p_rad = impurity_fraction * ne * ne * lz
        dte = (p_ohmic - p_rad) * dt / (1.5 * ne * E_CHARGE)
        return jnp.clip(te + dte, 0.2, 1e4), jnp.clip(te + dte, 0.2, 1e4)

    te0 = jnp.asarray(2.0, default_float())
    _, te_tr = jax.lax.scan(step, te0, jnp.arange(n_steps))
    return BurnThroughTrace(te_ev=te_tr, succeeded=te_tr[-1] > 100.0)


class StartupResult(NamedTuple):
    breakdown_ok: jnp.ndarray
    ionization_fraction: jnp.ndarray
    burn_through_ok: jnp.ndarray
    succeeded: jnp.ndarray


def run_startup_sequence(*, v_loop: float, p_pa: float, r0_m: float,
                         a_m: float, ne19_post: float = 1.0,
                         impurity_fraction: float = 0.01,
                         connection_length_m: float = 100.0
                         ) -> StartupResult:
    """Breakdown -> avalanche -> burn-through composite verdict
    (reference ``StartupSequence.run`` :287-310)."""
    bd = is_breakdown(v_loop, p_pa, connection_length_m)
    av = townsend_avalanche(v_loop=v_loop, p_pa=p_pa, r0_m=r0_m)
    bt = burn_through(v_loop=v_loop, r0_m=r0_m, a_m=a_m, ne19=ne19_post,
                      impurity_fraction=impurity_fraction)
    ok = bd & (av.ionization_fraction > 0.99) & bt.succeeded
    return StartupResult(breakdown_ok=bd,
                         ionization_fraction=av.ionization_fraction,
                         burn_through_ok=bt.succeeded, succeeded=ok)


# ---------------------------------------------------------------------------
# Scenario schedule (waveforms)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Waveform:
    """Piecewise-linear breakpoint waveform."""

    times: tuple
    values: tuple

    def __post_init__(self):
        if len(self.times) != len(self.values) or len(self.times) < 2:
            raise ValueError("waveform needs >= 2 matching breakpoints")
        if any(b <= a for a, b in zip(self.times, self.times[1:])):
            raise ValueError("waveform times must be strictly increasing")

    def __call__(self, t):
        return jnp.interp(jnp.asarray(t), jnp.asarray(self.times),
                          jnp.asarray(self.values))


@dataclasses.dataclass(frozen=True)
class ScenarioSchedule:
    """Named waveform bundle (reference ``ScenarioSchedule`` contract)."""

    waveforms: tuple   # ((name, Waveform), ...)

    def evaluate(self, t) -> dict:
        return {name: wf(t) for name, wf in self.waveforms}

    @property
    def duration(self) -> float:
        return max(wf.times[-1] for _, wf in self.waveforms)

    def validate(self) -> list:
        problems = []
        names = [n for n, _ in self.waveforms]
        if len(set(names)) != len(names):
            problems.append("duplicate waveform names")
        for name, wf in self.waveforms:
            if name.startswith("ip") and any(v < 0 for v in wf.values):
                problems.append(f"{name}: negative plasma current")
            if name.startswith("ne") and any(v <= 0 for v in wf.values):
                problems.append(f"{name}: non-positive density")
        return problems


def standard_shot_schedule(*, ip_flat_ma: float = 15.0,
                           ramp_s: float = 60.0, flattop_s: float = 300.0,
                           ne_flat_19: float = 10.0,
                           p_aux_flat_mw: float = 50.0) -> ScenarioSchedule:
    """Ramp-up / flattop / ramp-down template shot.

    Density is STAGED (ITER-style H-mode access): the Ip ramp ends at half
    the flattop density — where the Martin L-H threshold is low enough for
    the auxiliary power to cross it — and the density completes its ramp
    early in the flattop once alpha heating holds the plasma inside the
    H-mode hysteresis band.
    """
    end = 2 * ramp_s + flattop_s
    t_full_ne = ramp_s + 0.3 * flattop_s
    return ScenarioSchedule(waveforms=(
        ("ip_ma", Waveform((0.0, ramp_s, ramp_s + flattop_s, end),
                           (0.1, ip_flat_ma, ip_flat_ma, 0.1))),
        # Density pumps out FASTER than the current ramp-down so the
        # Greenwald fraction stays below 1 through termination.
        ("ne19", Waveform((0.0, ramp_s, t_full_ne, ramp_s + flattop_s,
                           ramp_s + flattop_s + 0.5 * ramp_s, end),
                          (0.5, 0.5 * ne_flat_19, ne_flat_19, ne_flat_19,
                           0.3, 0.3))),
        ("p_aux_mw", Waveform((0.0, 0.5 * ramp_s, ramp_s,
                               ramp_s + flattop_s, end),
                              (0.0, 0.0, p_aux_flat_mw, p_aux_flat_mw,
                               0.0))),
    ))


# ---------------------------------------------------------------------------
# Volt-second (flux) budget
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FluxBudget:
    """CS flux budget with Ejima resistive consumption (reference
    ``FluxBudget`` ``volt_second_manager.py:45-74``)."""

    phi_cs_vs: float           # total available CS swing [V s]
    l_plasma_uh: float         # plasma inductance [uH]
    r0_m: float = 6.2
    ejima_coeff: float = 0.45

    def inductive_flux(self, ip_ma):
        return self.l_plasma_uh * 1e-6 * jnp.asarray(ip_ma) * 1e6

    def resistive_flux(self, ip_ma):
        """Ejima: Phi_res = C_E mu0 R0 Ip."""
        return self.ejima_coeff * MU0 * self.r0_m * jnp.asarray(ip_ma) * 1e6

    def remaining_flux(self, ip_ma):
        return (self.phi_cs_vs - self.inductive_flux(ip_ma)
                - self.resistive_flux(ip_ma))

    def max_flattop_duration(self, ip_ma, loop_voltage_v,
                             bootstrap_fraction=0.0):
        """Flattop time = remaining flux / (V_loop * (1 - f_bs))."""
        v_eff = jnp.maximum(
            jnp.asarray(loop_voltage_v) * (1.0 - bootstrap_fraction), 1e-6)
        return jnp.maximum(self.remaining_flux(ip_ma), 0.0) / v_eff


class FluxConsumptionTrace(NamedTuple):
    consumed_vs: jnp.ndarray
    remaining_vs: jnp.ndarray
    exhausted_at_s: jnp.ndarray


def monitor_flux_consumption(budget: FluxBudget, times_s: jnp.ndarray,
                             ip_ma: jnp.ndarray,
                             v_loop: jnp.ndarray) -> FluxConsumptionTrace:
    """Integrate V_loop dt on top of the inductive share; report when the
    budget runs out (reference ``FluxConsumptionMonitor``)."""
    dt = jnp.diff(times_s, prepend=times_s[0])
    resistive = jnp.cumsum(v_loop * dt)
    consumed = budget.inductive_flux(ip_ma) + resistive
    remaining = budget.phi_cs_vs - consumed
    out = remaining <= 0.0
    t_exhaust = jnp.where(jnp.any(out),
                          times_s[jnp.argmax(out)], jnp.inf)
    return FluxConsumptionTrace(consumed_vs=consumed,
                                remaining_vs=remaining,
                                exhausted_at_s=t_exhaust)
