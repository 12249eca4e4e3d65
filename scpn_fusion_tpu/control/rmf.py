"""Rotating-magnetic-field (RMF) current drive + phase-lock control.

Role-parity with the reference's RMF lane
(``control/rmf_phase_lock.py`` phase-locked-loop regulation of the RMF
antenna pair against the electron rotation, and the Rust RMF bindings
``fusion-python/src/bindings/rmf.rs`` driving the FRC current): a reduced
RMF-FRC coupling model — electron fluid spun up by the rotating field
torque against ion-electron friction — with a PLL that keeps the antenna
phase locked to the (measured) rotation angle, all under ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RMFParams:
    b_rmf_mt: float = 2.0          # RMF amplitude
    omega_rmf_hz: float = 100e3    # drive frequency
    spin_up_rate: float = 3e4      # torque coefficient [1/(s mT)]
    friction_rate: float = 2e4     # e-i friction relaxation [1/s]
    dt_s: float = 1e-7
    n_steps: int = 20000


class RMFTrace(NamedTuple):
    omega_e_hz: jnp.ndarray        # electron rotation frequency history
    sync_fraction: jnp.ndarray     # omega_e / omega_rmf at end
    drive_efficiency: jnp.ndarray  # average torque duty
    synchronised: jnp.ndarray


def run_rmf_spinup(p: RMFParams) -> RMFTrace:
    """Electron spin-up under RMF torque vs friction.

    Normalised rotation x = omega_e/omega_rmf relaxes as
    ``dx/dt = nu_d (1 - x) - nu_f x`` with the drive rate
    ``nu_d = spin_up_rate * B_rmf`` (the field drags the electrons toward
    synchronism in proportion to the slip) — so the steady state
    ``x* = nu_d / (nu_d + nu_f)`` reproduces the reference's penetration
    criterion: synchronisation requires the drive to beat friction.
    """
    nu_d = p.spin_up_rate * p.b_rmf_mt

    def step(x, _):
        torque = nu_d * (1.0 - x)
        x1 = jnp.clip(x + p.dt_s * (torque - p.friction_rate * x),
                      0.0, 1.0)
        return x1, (x1 * p.omega_rmf_hz, torque)

    _, (omega_hz, torque) = jax.lax.scan(step, jnp.asarray(0.0), None,
                                         length=p.n_steps)
    sync = omega_hz[-1] / p.omega_rmf_hz
    duty = jnp.mean(torque) / jnp.maximum(nu_d, 1e-30)
    return RMFTrace(omega_e_hz=omega_hz, sync_fraction=sync,
                    drive_efficiency=duty, synchronised=sync > 0.85)


@dataclasses.dataclass(frozen=True)
class PLLParams:
    kp_hz_per_rad: float = 2e3
    ki_hz_per_rad_s: float = 2e6
    dt_s: float = 1e-5
    n_steps: int = 5000


class PLLTrace(NamedTuple):
    phase_error: jnp.ndarray
    antenna_freq_hz: jnp.ndarray
    locked: jnp.ndarray            # final |error| < 0.05 rad
    lock_time_s: jnp.ndarray


def run_phase_lock(pll: PLLParams, *, rotation_hz: float = 95e3,
                   antenna_hz0: float = 100e3,
                   freq_drift_hz_s: float = 0.0) -> PLLTrace:
    """PI phase-locked loop steering the antenna onto the rotation angle
    (reference ``rmf_phase_lock.py`` loop shape, incl. a drifting target).
    """
    def step(carry, k):
        theta_rot, theta_ant, f_base = carry
        f_rot = rotation_hz + freq_drift_hz_s * k * pll.dt_s
        theta_rot1 = theta_rot + 2.0 * jnp.pi * f_rot * pll.dt_s
        err = jnp.arctan2(jnp.sin(theta_rot1 - theta_ant),
                          jnp.cos(theta_rot1 - theta_ant))
        # PI in frequency: integral lives in the base frequency itself
        f_base1 = f_base + pll.ki_hz_per_rad_s * err * pll.dt_s
        f_cmd = f_base1 + pll.kp_hz_per_rad * err
        theta_ant1 = theta_ant + 2.0 * jnp.pi * f_cmd * pll.dt_s
        return (theta_rot1, theta_ant1, f_base1), (err, f_cmd)

    init = (jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(antenna_hz0))
    _, (err, f_cmd) = jax.lax.scan(step, init, jnp.arange(pll.n_steps))
    locked_mask = jnp.abs(err) < 0.15
    # first index after which the loop STAYS locked
    ever_unlocked_after = jnp.cumsum(
        (~locked_mask)[::-1].astype(jnp.int32))[::-1]
    stays = ever_unlocked_after == 0
    t_lock = jnp.where(jnp.any(stays),
                       jnp.argmax(stays) * pll.dt_s, jnp.inf)
    # "Locked" requires a SUSTAINED small error over the final 5% of the
    # run — a slipping loop aliases through zero error periodically.
    tail = max(pll.n_steps // 20, 1)
    locked = jnp.all(locked_mask[-tail:])
    return PLLTrace(phase_error=err, antenna_freq_hz=f_cmd,
                    locked=locked, lock_time_s=t_lock)
