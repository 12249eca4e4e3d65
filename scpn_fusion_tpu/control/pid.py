"""PID controller as a pure function with explicit state.

JAX port of the reference's PID step (``control/tokamak_flight_sim.py:
194-246``): fail-safe on non-finite error — the integrator is not
accumulated and a zero command is returned, so one NaN can never latch the
error sum.  Gains travel as a traced pytree so gain-scheduling and
``jax.grad``-based tuning come for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PIDGains(NamedTuple):
    kp: jnp.ndarray
    ki: jnp.ndarray
    kd: jnp.ndarray


class PIDState(NamedTuple):
    err_sum: jnp.ndarray
    last_err: jnp.ndarray


def pid_init(dtype=jnp.float32) -> PIDState:
    return PIDState(jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))


def pid_step(gains: PIDGains, state: PIDState, error):
    """One PID update; returns (new_state, command)."""
    ok = jnp.isfinite(error)
    err = jnp.where(ok, error, 0.0)
    err_sum = state.err_sum + jnp.where(ok, err, 0.0)
    d_err = err - state.last_err
    cmd = gains.kp * err + gains.ki * err_sum + gains.kd * d_err
    cmd = jnp.where(ok, cmd, 0.0)
    new_state = PIDState(
        err_sum=jnp.where(ok, err_sum, state.err_sum),
        last_err=jnp.where(ok, err, state.last_err),
    )
    return new_state, cmd
