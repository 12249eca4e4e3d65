"""Physics-facing controllers: density, burn, detachment, fault tolerance.

Role-parity with the reference control family
(``control/density_controller.py`` gas-puff density regulation with a
Greenwald ceiling, ``control/burn_controller.py`` auxiliary-power burn
regulation, ``control/detachment_controller.py:77-197`` impurity-seeded
target-heat-flux regulation against the two-point SOL model, and
``control/fault_tolerant_control.py`` sensor-fault detection with control
reallocation).

Design: every controller is (state, observation) -> (state, action) as a
pure function, so whole shots run inside ``lax.scan`` with the plant — the
same fused-loop architecture as the SCPN controller lane.  All controllers
carry the reference's NaN fail-safe semantics (a non-finite observation
freezes the action at zero command, ``tokamak_flight_sim.py:239``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.models.physics.edge import two_point_sol


def _failsafe(value, fallback=0.0):
    return jnp.where(jnp.isfinite(value), value, fallback)


# ---------------------------------------------------------------------------
# Density controller (gas puff + Greenwald ceiling)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DensityControllerParams:
    kp: float = 2.0
    ki: float = 0.5
    puff_max: float = 10.0           # max gas-puff command [a.u.]
    greenwald_fraction_max: float = 0.85
    pumpout_rate: float = 0.2        # density decay toward wall pumping


class DensityControllerState(NamedTuple):
    integral: jnp.ndarray


def density_controller_step(p: DensityControllerParams,
                            state: DensityControllerState,
                            ne19, ne19_target, ip_ma, a_m, dt):
    """PI gas-puff command; the target itself is capped at the Greenwald
    ceiling so the controller never drives the plasma over the limit."""
    n_gw19 = 10.0 * ip_ma / (jnp.pi * a_m ** 2)
    target = jnp.minimum(ne19_target, p.greenwald_fraction_max * n_gw19)
    err = _failsafe(target - ne19)
    integral = jnp.clip(state.integral + err * dt, -10.0, 10.0)
    puff = jnp.clip(p.kp * err + p.ki * integral, 0.0, p.puff_max)
    return DensityControllerState(integral=integral), puff


def density_plant_step(ne19, puff, p: DensityControllerParams, dt):
    """Reduced fueling plant: dn/dt = puff - pumpout * n."""
    return jnp.maximum(ne19 + dt * (puff - p.pumpout_rate * ne19), 0.01)


# ---------------------------------------------------------------------------
# Burn controller (P_aux modulation toward a target Q or temperature)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BurnControllerParams:
    kp: float = 5.0
    ki: float = 1.0
    p_aux_min_mw: float = 0.0
    p_aux_max_mw: float = 100.0
    slew_mw_s: float = 20.0


class BurnControllerState(NamedTuple):
    integral: jnp.ndarray
    p_aux_mw: jnp.ndarray


def burn_controller_step(p: BurnControllerParams,
                         state: BurnControllerState,
                         t_kev, t_target_kev, dt):
    """PI on core temperature via auxiliary heating with slew + saturation
    (anti-windup: the integral only accumulates when unsaturated)."""
    err = _failsafe(t_target_kev - t_kev)
    raw = p.kp * err + p.ki * state.integral
    lo, hi = p.p_aux_min_mw, p.p_aux_max_mw
    slewed = jnp.clip(raw, state.p_aux_mw - p.slew_mw_s * dt,
                      state.p_aux_mw + p.slew_mw_s * dt)
    cmd = jnp.clip(slewed, lo, hi)
    unsaturated = (cmd > lo + 1e-9) & (cmd < hi - 1e-9)
    integral = state.integral + jnp.where(unsaturated, err * dt, 0.0)
    return BurnControllerState(integral=integral, p_aux_mw=cmd), cmd


# ---------------------------------------------------------------------------
# Detachment controller (impurity seeding on target heat flux)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DetachmentControllerParams:
    q_target_mw_m2: float = 5.0
    kp: float = 0.08
    ki: float = 0.02
    f_rad_max: float = 0.99
    r0_m: float = 6.2
    a_m: float = 2.0
    q95: float = 3.5
    b_pol_t: float = 1.2
    # parallel -> target-surface projection: field-line tilt * flux expansion
    tilt_sin: float = 0.05
    f_expansion: float = 8.0


class DetachmentControllerState(NamedTuple):
    f_rad: jnp.ndarray      # commanded radiated fraction (seeding level)
    integral: jnp.ndarray


def target_surface_flux(p: DetachmentControllerParams, q_parallel_mw_m2,
                        f_rad):
    """Perpendicular flux on the target plate: parallel flux reduced by
    radiation, field-line tilt, and poloidal flux expansion."""
    return (q_parallel_mw_m2 * (1.0 - f_rad) * p.tilt_sin
            / jnp.maximum(p.f_expansion, 1.0))


def detachment_controller_step(p: DetachmentControllerParams,
                               state: DetachmentControllerState,
                               p_sol_mw, n_u_19, dt):
    """Regulate the parallel target heat flux by impurity seeding.

    The plant is the two-point SOL model (``models/physics/edge.py``);
    seeding raises f_rad, which lowers q_parallel at the target (reference
    ``detachment_controller.py:77-197`` loop shape).
    """
    sol = two_point_sol(p_sol_mw=p_sol_mw, n_u_19=n_u_19, r0=p.r0_m,
                        a=p.a_m, q95=p.q95, b_pol=p.b_pol_t,
                        f_rad=state.f_rad)
    q_t = target_surface_flux(p, sol.q_parallel_mw_m2, state.f_rad)
    err = _failsafe(q_t - p.q_target_mw_m2)       # positive -> seed more
    integral = jnp.clip(state.integral + err * dt, -50.0, 50.0)
    f_rad = jnp.clip(state.f_rad + p.kp * err * dt + p.ki * integral * dt,
                     0.0, p.f_rad_max)
    new_state = DetachmentControllerState(f_rad=f_rad, integral=integral)
    return new_state, f_rad, sol


def run_detachment_loop(p: DetachmentControllerParams, *, p_sol_mw,
                        n_u_19, dt=0.05, n_steps: int = 200):
    """Whole seeding loop under scan; returns f_rad and q_target traces."""
    def tick(state, _):
        state, f_rad, sol = detachment_controller_step(
            p, state, p_sol_mw, n_u_19, dt)
        q_t = target_surface_flux(p, sol.q_parallel_mw_m2, f_rad)
        return state, (f_rad, q_t)

    init = DetachmentControllerState(f_rad=jnp.asarray(0.0),
                                     integral=jnp.asarray(0.0))
    final, (f_rad_tr, q_tr) = jax.lax.scan(tick, init, None, length=n_steps)
    return final, f_rad_tr, q_tr


# ---------------------------------------------------------------------------
# Fault-tolerant control (sensor voting + actuator reallocation)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FaultToleranceParams:
    residual_threshold: float = 3.0     # sigma units
    min_healthy_sensors: int = 2


class FaultReport(NamedTuple):
    healthy: jnp.ndarray        # (n_sensors,) bool
    fused_estimate: jnp.ndarray
    degraded: jnp.ndarray       # bool: too few healthy sensors


def sensor_vote(readings: jnp.ndarray, sigma: jnp.ndarray,
                p: FaultToleranceParams = FaultToleranceParams()
                ) -> FaultReport:
    """Median-residual fault detection + inverse-variance fusion.

    A sensor is faulted when its residual against the median exceeds
    ``threshold * sigma`` or is non-finite (reference
    ``fault_tolerant_control.py`` voting contract).
    """
    finite = jnp.isfinite(readings)
    safe = jnp.where(finite, readings, 0.0)
    med = jnp.nanmedian(jnp.where(finite, readings, jnp.nan))
    med = jnp.where(jnp.isfinite(med), med, 0.0)
    resid = jnp.abs(safe - med) / jnp.maximum(sigma, 1e-12)
    healthy = finite & (resid < p.residual_threshold)
    w = jnp.where(healthy, 1.0 / jnp.maximum(sigma, 1e-12) ** 2, 0.0)
    fused = jnp.sum(w * safe) / jnp.maximum(jnp.sum(w), 1e-30)
    degraded = jnp.sum(healthy) < p.min_healthy_sensors
    fused = jnp.where(degraded, med, fused)
    return FaultReport(healthy=healthy, fused_estimate=fused,
                       degraded=degraded)


def reallocate_actuators(demand: jnp.ndarray, available: jnp.ndarray,
                         effectiveness: jnp.ndarray) -> jnp.ndarray:
    """Redistribute a total actuation demand over healthy actuators,
    weighted by effectiveness (failed actuators get zero)."""
    w = jnp.where(available, jnp.maximum(effectiveness, 0.0), 0.0)
    total_w = jnp.maximum(jnp.sum(w), 1e-30)
    return demand * w / total_w
