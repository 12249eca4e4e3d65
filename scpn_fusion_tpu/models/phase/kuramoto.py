"""Mean-field Kuramoto-Sakaguchi phase dynamics with global driver.

JAX port of the reference's phase engine (``phase/kuramoto.py:34-170``; Rust
twin ``fusion-phase``):

    dtheta_i/dt = omega_i + K R sin(psi_r - theta_i - alpha)
                  + zeta sin(Psi - theta_i)

with the Kuramoto order parameter ``R exp(i psi_r) = <exp(i theta)>``, a
global driver phase Psi (external or mean-field), the Lyapunov candidate
``V = <1 - cos(theta - Psi)>`` and exponent ``lambda = ln(V_f/V_0)/T``
(used by ``FusionKernel.phase_sync_step_lyapunov``).  Trajectories run under
``lax.scan``; everything is vmap-able over oscillator ensembles.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def wrap_phase(x: jnp.ndarray) -> jnp.ndarray:
    """Map phases to (-pi, pi]."""
    return (x + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def order_parameter(theta: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Kuramoto order parameter (R, psi_r)."""
    if weights is None:
        z = jnp.mean(jnp.exp(1j * theta))
    else:
        w = weights / jnp.maximum(jnp.sum(weights), 1e-15)
        z = jnp.sum(w * jnp.exp(1j * theta))
    return jnp.abs(z), jnp.angle(z)


def lyapunov_v(theta: jnp.ndarray, psi) -> jnp.ndarray:
    """V = <1 - cos(theta - Psi)>; 0 at sync, 2 at maximal desync."""
    return jnp.mean(1.0 - jnp.cos(theta - psi))


def lyapunov_exponent(v_hist: jnp.ndarray, dt: float) -> jnp.ndarray:
    """lambda = ln(V_final / V_initial) / T; lambda < 0 => stable."""
    v0 = jnp.maximum(v_hist[0], 1e-15)
    vf = jnp.maximum(v_hist[-1], 1e-15)
    t_total = v_hist.shape[0] * dt
    return jnp.log(vf / v0) / t_total


class KuramotoOut(NamedTuple):
    theta1: jnp.ndarray
    dtheta: jnp.ndarray
    r: jnp.ndarray
    psi_r: jnp.ndarray
    psi: jnp.ndarray


def kuramoto_sakaguchi_step(
    theta: jnp.ndarray,
    omega: jnp.ndarray,
    *,
    dt,
    k,
    alpha=0.0,
    zeta=0.0,
    psi_driver=None,
    psi_mode: str = "external",
    wrap: bool = True,
) -> KuramotoOut:
    """Single Euler step (driver resolved per ``psi_mode``, static)."""
    r, psi_r = order_parameter(theta)
    if psi_mode == "external":
        if psi_driver is None:
            raise ValueError("psi_driver required when psi_mode='external'")
        psi = jnp.asarray(psi_driver, theta.dtype)
    elif psi_mode == "mean_field":
        psi = psi_r
    else:
        raise ValueError(f"Unknown psi_mode: {psi_mode}")

    dtheta = omega + (k * r) * jnp.sin(psi_r - theta - alpha)
    dtheta = dtheta + zeta * jnp.sin(psi - theta)
    th1 = theta + dt * dtheta
    if wrap:
        th1 = wrap_phase(th1)
    return KuramotoOut(th1, dtheta, r, psi_r, psi)


@partial(jax.jit, static_argnames=("n_steps", "psi_mode", "wrap"))
def run_kuramoto(
    theta0: jnp.ndarray,
    omega: jnp.ndarray,
    *,
    dt,
    k,
    alpha=0.0,
    zeta=0.0,
    psi_driver=0.0,
    psi_mode: str = "external",
    wrap: bool = True,
    n_steps: int = 1000,
):
    """Run a phase trajectory; returns (theta_final, traces{R, V, lambda})."""
    psi_d = jnp.asarray(psi_driver)

    def step(th, _):
        out = kuramoto_sakaguchi_step(
            th, omega, dt=dt, k=k, alpha=alpha, zeta=zeta,
            psi_driver=psi_d, psi_mode=psi_mode, wrap=wrap)
        v = lyapunov_v(out.theta1, out.psi)
        return out.theta1, {"r": out.r, "v": v}

    theta_f, trace = jax.lax.scan(step, theta0, None, length=n_steps)
    lam = lyapunov_exponent(trace["v"], dt)
    return theta_f, {"r": trace["r"], "v": trace["v"], "lyapunov": lam,
                     "stable": lam < 0.0}
