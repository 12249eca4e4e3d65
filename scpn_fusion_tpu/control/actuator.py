"""First-order actuator model: lag + slew + saturation + delay + fail-safe.

JAX port of the reference's ``FirstOrderActuator``
(``control/tokamak_flight_sim.py:31-128``): first-order lag
``u += dt/(tau+dt) (cmd - u)``, coil-current rate limit, absolute
saturation, pure transport delay via a fixed ring buffer, and the fail-safe
hold: a non-finite command never poisons the actuator state (the last valid
state is held and the fault is counted).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ActuatorParams:
    tau_s: float
    dt_s: float
    u_min: float = -5.0e4
    u_max: float = 5.0e4
    rate_limit: float = 1.0e6
    delay_steps: int = 0

    def __post_init__(self) -> None:
        if not self.tau_s > 0:
            raise ValueError("tau_s must be > 0")
        if not self.dt_s > 0:
            raise ValueError("dt_s must be > 0")
        if self.delay_steps < 0:
            raise ValueError("delay_steps must be >= 0")


class ActuatorState(NamedTuple):
    u: jnp.ndarray           # applied state
    delay_buf: jnp.ndarray   # (delay_steps+1,) ring buffer
    cursor: jnp.ndarray      # int32
    faults: jnp.ndarray      # int32


def actuator_init(params: ActuatorParams, dtype=jnp.float32) -> ActuatorState:
    return ActuatorState(
        u=jnp.asarray(0.0, dtype),
        delay_buf=jnp.zeros((params.delay_steps + 1,), dtype),
        cursor=jnp.int32(0),
        faults=jnp.int32(0),
    )


def actuator_step(params: ActuatorParams, state: ActuatorState, command):
    """Apply one command; returns (new_state, applied_output).

    The output is the delayed applied state (pure transport delay of
    ``delay_steps`` ticks); with zero delay it is the new state itself.
    """
    ok = jnp.isfinite(command)
    cmd = jnp.clip(jnp.where(ok, command, state.u), params.u_min, params.u_max)
    alpha = params.dt_s / (params.tau_s + params.dt_s)
    u_new = state.u + alpha * (cmd - state.u)
    du = jnp.clip(u_new - state.u,
                  -params.rate_limit * params.dt_s,
                  params.rate_limit * params.dt_s)
    u_new = jnp.where(ok, state.u + du, state.u)

    # Scatter requires value dtype == buffer dtype (an x64 command into an
    # f32 delay buffer would FutureWarn, and later error, in JAX).
    buf = state.delay_buf.at[state.cursor].set(
        u_new.astype(state.delay_buf.dtype))
    n = buf.shape[0]
    read_idx = (state.cursor + 1) % n  # oldest entry = delayed output
    out = jnp.where(params.delay_steps > 0, buf[read_idx], u_new)
    return ActuatorState(
        u=u_new,
        delay_buf=buf,
        cursor=(state.cursor + 1) % n,
        faults=state.faults + jnp.where(ok, 0, 1).astype(jnp.int32),
    ), out
