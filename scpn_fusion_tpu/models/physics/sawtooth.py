"""Kadomtsev sawtooth cycle: q=1 trigger, reconnection crash, mixing.

JAX port of the reference's sawtooth machinery (``core/sawtooth.py:22-200``):
the monitor finds the q=1 radius, the Kadomtsev crash computes the mixing
radius from the helical-flux proxy ``dpsi*/drho = rho (1/q - 1)``, then
flattens density (particle-conserving volume average) and temperature
(energy-conserving pressure average ``T_mix = <nT>/<n>``) inside the mixing
radius and resets the core q just above unity.  Fully jittable (searchsorted
-> masked arithmetic) so sawtoothing composes with the transport scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SawtoothCrash(NamedTuple):
    t_new: jnp.ndarray
    n_new: jnp.ndarray
    q_new: jnp.ndarray
    rho_1: jnp.ndarray       # q=1 radius (nan if none)
    rho_mix: jnp.ndarray     # mixing radius
    triggered: jnp.ndarray   # bool


def find_q1_radius(rho: jnp.ndarray, q: jnp.ndarray):
    """Outermost-inward linear-interpolated q=1 crossing (nan if q>1 all)."""
    below = q < 1.0
    any_below = jnp.any(below)
    # First index from the axis where q crosses 1 going outward.
    crossing = (q[:-1] < 1.0) & (q[1:] >= 1.0)
    idx = jnp.argmax(crossing)
    has_cross = jnp.any(crossing)
    frac = (1.0 - q[idx]) / jnp.maximum(q[idx + 1] - q[idx], 1e-12)
    rho_1 = rho[idx] + frac * (rho[idx + 1] - rho[idx])
    rho_1 = jnp.where(has_cross, rho_1,
                      jnp.where(any_below, rho[-1], jnp.nan))
    return jnp.where(any_below, rho_1, jnp.nan)


def check_trigger(q: jnp.ndarray, shear: jnp.ndarray, s_crit: float = 0.1):
    """Crash trigger: q<1 exists and local shear at q=1 exceeds s_crit."""
    below = q < 1.0
    s_at = jnp.where(below, shear, 0.0)
    return jnp.any(below) & (jnp.max(jnp.abs(s_at)) > s_crit)


def kadomtsev_crash(
    rho: jnp.ndarray,
    t: jnp.ndarray,
    n: jnp.ndarray,
    q: jnp.ndarray,
) -> SawtoothCrash:
    """Apply Kadomtsev reconnection mixing (no-op when q >= 1 everywhere)."""
    rho_1 = find_q1_radius(rho, q)
    has_q1 = jnp.isfinite(rho_1)

    # Helical flux proxy psi*(rho) by trapezoid integration.
    integrand = rho * (1.0 / jnp.maximum(q, 1e-6) - 1.0)
    d_rho = jnp.diff(rho)
    increments = 0.5 * (integrand[1:] + integrand[:-1]) * d_rho
    psi_star = jnp.concatenate([jnp.zeros((1,), rho.dtype),
                                jnp.cumsum(increments)])

    # Mixing radius: first psi* <= 0 crossing beyond rho_1.
    beyond = rho >= jnp.where(has_q1, rho_1, jnp.inf)
    crossed = beyond & (psi_star <= 0.0)
    idx_mix = jnp.argmax(crossed)
    any_crossed = jnp.any(crossed)
    prev = jnp.maximum(idx_mix - 1, 0)
    frac = psi_star[prev] / jnp.maximum(psi_star[prev] - psi_star[idx_mix], 1e-30)
    rho_mix_val = rho[prev] + frac * (rho[idx_mix] - rho[prev])
    rho_mix = jnp.where(any_crossed, rho_mix_val, rho[-1])
    rho_mix = jnp.where(has_q1, rho_mix, jnp.nan)

    # Conservative mixing inside rho_mix.
    inside = rho < jnp.where(has_q1, rho_mix, -1.0)
    w = jnp.where(inside, rho, 0.0)
    w_sum = jnp.maximum(jnp.sum(w), 1e-30)
    n_mix = jnp.sum(w * n) / w_sum
    t_mix = jnp.sum(w * n * t) / jnp.maximum(jnp.sum(w * n), 1e-30)

    t_new = jnp.where(inside, t_mix, t)
    n_new = jnp.where(inside, n_mix, n)
    q_new = jnp.where(inside, 1.01, q)

    return SawtoothCrash(
        t_new=jnp.where(has_q1, t_new, t),
        n_new=jnp.where(has_q1, n_new, n),
        q_new=jnp.where(has_q1, q_new, q),
        rho_1=rho_1, rho_mix=rho_mix, triggered=has_q1)


def sawtooth_step(
    rho: jnp.ndarray,
    t: jnp.ndarray,
    n: jnp.ndarray,
    q: jnp.ndarray,
    shear: jnp.ndarray,
    s_crit: float = 0.1,
) -> SawtoothCrash:
    """Monitor + conditional crash in one jittable call."""
    fire = check_trigger(q, shear, s_crit)
    crash = kadomtsev_crash(rho, t, n, q)
    keep = lambda new, old: jnp.where(fire & crash.triggered, new, old)  # noqa: E731
    return SawtoothCrash(
        t_new=keep(crash.t_new, t),
        n_new=keep(crash.n_new, n),
        q_new=keep(crash.q_new, q),
        rho_1=jnp.where(fire, crash.rho_1, jnp.nan),
        rho_mix=jnp.where(fire, crash.rho_mix, jnp.nan),
        triggered=fire & crash.triggered)
