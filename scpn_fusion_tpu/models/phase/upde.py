"""Multi-layer UPDE (universal phase-dynamics equation) system.

JAX port of the reference's multi-layer phase engine
(``phase/upde.py:40-400``; Rust twin ``fusion-phase``).  TPU-first redesign:
layers are a dense ``(L, N)`` array (uniform oscillators per layer) instead
of the reference's ragged flat-vector + offsets, so the whole tick is one
vectorised computation:

    dtheta^m = omega^m
             + g K[m,m] R_m sin(psi_m - theta^m - alpha[m,m])            (intra)
             + g sum_{n != m} (1 + gamma_pac (1 - R_n)) K[n,m] R_n
                                sin(psi_n - theta^m - alpha[n,m])        (inter)
             + zeta_m sin(Psi - theta^m)                                 (driver)

with per-layer order parameters (R_m, psi_m), PAC-style gating, per-tick
coupling override (adaptive K), and layer/global Lyapunov diagnostics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.phase.kuramoto import lyapunov_v, wrap_phase


@dataclasses.dataclass(frozen=True)
class UPDESpec:
    """Static layer topology: L layers x N oscillators."""

    n_layers: int
    n_per_layer: int
    psi_mode: str = "external"   # "external" | "global_mean_field"
    wrap: bool = True

    def __post_init__(self) -> None:
        if self.psi_mode not in ("external", "global_mean_field"):
            raise ValueError(f"Unknown psi_mode: {self.psi_mode}")


class UPDETick(NamedTuple):
    theta1: jnp.ndarray     # (L, N)
    dtheta: jnp.ndarray
    r_layer: jnp.ndarray    # (L,)
    psi_layer: jnp.ndarray  # (L,)
    r_global: jnp.ndarray
    v_layer: jnp.ndarray
    v_global: jnp.ndarray


def upde_tick(
    spec: UPDESpec,
    theta: jnp.ndarray,      # (L, N)
    omega: jnp.ndarray,      # (L, N)
    k_matrix: jnp.ndarray,   # (L, L) source-row, target-column
    alpha: jnp.ndarray,      # (L, L)
    zeta: jnp.ndarray,       # (L,)
    *,
    dt,
    psi_driver=0.0,
    actuation_gain=1.0,
    pac_gamma=0.0,
) -> UPDETick:
    """One Euler tick of the full multi-layer system (vectorised)."""
    z_layer = jnp.mean(jnp.exp(1j * theta), axis=1)           # (L,)
    r_m = jnp.abs(z_layer)
    psi_m = jnp.angle(z_layer)
    z_global = jnp.mean(jnp.exp(1j * theta))
    r_global = jnp.abs(z_global)

    if spec.psi_mode == "external":
        psi_g = jnp.asarray(psi_driver, theta.dtype)
    else:
        psi_g = jnp.angle(jnp.sum(r_m * jnp.exp(1j * psi_m))).astype(theta.dtype)

    g = actuation_gain
    # Coupling drive from source layer n onto target layer m, evaluated for
    # every oscillator of layer m:
    #   sum_n gate(n) K[n, m] R_n sin(psi_n - theta^m - alpha[n, m])
    # with gate = 1 for n == m and the PAC gate otherwise.
    pac_gate = 1.0 + pac_gamma * (1.0 - r_m)                  # (L,) per source
    eye = jnp.eye(spec.n_layers, dtype=theta.dtype)
    gate = pac_gate[:, None] * (1.0 - eye) + eye              # (L_src, L_tgt)

    # phase difference tensor: (L_src, L_tgt, N)
    phase = psi_m[:, None, None] - theta[None, :, :] - alpha[:, :, None]
    contrib = (gate * k_matrix * r_m[:, None])[:, :, None] * jnp.sin(phase)
    drive = g * jnp.sum(contrib, axis=0)                      # (L_tgt, N)

    dtheta = omega + drive + zeta[:, None] * jnp.sin(psi_g - theta)
    th1 = theta + dt * dtheta
    if spec.wrap:
        th1 = wrap_phase(th1)

    v_layer = jax.vmap(lambda t: lyapunov_v(t, psi_g))(th1)
    v_global = lyapunov_v(th1.reshape(-1), psi_g)
    return UPDETick(th1, dtheta, r_m, psi_m, r_global, v_layer, v_global)


@partial(jax.jit, static_argnames=("spec", "n_steps"))
def run_upde(
    spec: UPDESpec,
    theta0: jnp.ndarray,
    omega: jnp.ndarray,
    k_matrix: jnp.ndarray,
    alpha: jnp.ndarray,
    zeta: jnp.ndarray,
    *,
    dt,
    psi_driver=0.0,
    actuation_gain=1.0,
    pac_gamma=0.0,
    n_steps: int = 1000,
):
    """Run the multi-layer system; returns (theta_final, traces)."""
    def step(th, _):
        out = upde_tick(spec, th, omega, k_matrix, alpha, zeta,
                        dt=dt, psi_driver=psi_driver,
                        actuation_gain=actuation_gain, pac_gamma=pac_gamma)
        return out.theta1, {"r_layer": out.r_layer, "r_global": out.r_global,
                            "v_global": out.v_global}

    theta_f, trace = jax.lax.scan(step, theta0, None, length=n_steps)
    return theta_f, trace
