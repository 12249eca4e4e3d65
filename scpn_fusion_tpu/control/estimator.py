"""Extended Kalman filter for plasma state estimation (pure functions).

JAX port of the reference's ``ExtendedKalmanFilter``
(``control/state_estimator.py:23-160``): 6D state [R, Z, vR, vZ, Ip, Te_core],
4D measurement [R, Z, Ip, Te_core], constant-velocity process model.  State
is an explicit pytree so the filter composes with ``lax.scan`` and with the
compiled control loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from scpn_fusion_tpu.core.dtypes import canonical, default_float


class EKFState(NamedTuple):
    x: jnp.ndarray   # (6,)
    p: jnp.ndarray   # (6, 6)


def ekf_init(x0: jnp.ndarray, p0: jnp.ndarray) -> EKFState:
    return EKFState(jnp.asarray(x0), jnp.asarray(p0))


def measurement_matrix(dtype=None) -> jnp.ndarray:
    dtype = default_float() if dtype is None else canonical(dtype)
    h = jnp.zeros((4, 6), dtype)
    return h.at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 4].set(1.0).at[3, 5].set(1.0)


def ekf_predict(state: EKFState, q: jnp.ndarray, dt) -> EKFState:
    """Constant-velocity prediction: R += vR dt, Z += vZ dt."""
    f = jnp.eye(6, dtype=state.x.dtype)
    f = f.at[0, 2].set(dt).at[1, 3].set(dt)
    x = f @ state.x
    p = f @ state.p @ f.T + q * dt
    return EKFState(x, p)


def ekf_update(state: EKFState, z: jnp.ndarray, r_cov: jnp.ndarray) -> EKFState:
    """Measurement update with the linear H (Joseph-free standard form)."""
    h = measurement_matrix(state.x.dtype)
    y = z - h @ state.x
    s = h @ state.p @ h.T + r_cov
    k = state.p @ h.T @ jnp.linalg.inv(s)
    x = state.x + k @ y
    p = (jnp.eye(6, dtype=state.x.dtype) - k @ h) @ state.p
    return EKFState(x, p)


def ekf_step(state: EKFState, z: jnp.ndarray, q: jnp.ndarray,
             r_cov: jnp.ndarray, dt) -> EKFState:
    """Predict + update in one call (per control tick)."""
    return ekf_update(ekf_predict(state, q, dt), z, r_cov)
