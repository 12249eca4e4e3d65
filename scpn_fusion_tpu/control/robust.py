"""Robust control: mu-synthesis (D-K lite) and RWM magnetic feedback.

Role-parity with the reference's robust-control family
(``control/mu_synthesis.py:191`` ``MuSynthesisController`` — D-K-style
iteration returning a robustly-stabilising gain with a structured-
singular-value bound — and ``control/rwm_feedback.py`` resistive-wall-mode
magnetic feedback with sensor/actuator dynamics).  Built on the H-inf
Riccati machinery in ``control/hinf.py``; everything traceable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.control.hinf import solve_care_ode


# ---------------------------------------------------------------------------
# mu-synthesis (D-K iteration with diagonal D scales)
# ---------------------------------------------------------------------------

class MuSynthesisResult(NamedTuple):
    k_gain: jnp.ndarray         # state-feedback gain
    d_scales: jnp.ndarray       # diagonal uncertainty scalings
    mu_upper_bound: jnp.ndarray
    gamma: jnp.ndarray
    converged: jnp.ndarray


def _hinf_norm_bound(a_cl: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                     *, gammas=None) -> jnp.ndarray:
    """Upper bound of the closed-loop H-inf norm by scanning the
    bounded-real-lemma Riccati feasibility over a gamma grid."""
    if gammas is None:
        gammas = jnp.logspace(-1.0, 2.0, 25)
    bbt = b @ b.T
    q = c.T @ c

    def feasible(gamma):
        # Bounded-real: A'X + XA + X BB' X / g^2 + C'C = 0, X >= 0.
        # solve_care_ode integrates A'X + XA - XSX + Q, so S = -BB'/g^2.
        x = solve_care_ode(a_cl, -bbt / gamma ** 2, q,
                           n_steps=400, dt=2e-3)
        finite = jnp.all(jnp.isfinite(x))
        eig = jnp.max(jnp.real(jnp.linalg.eigvals(
            a_cl + bbt @ x / gamma ** 2)))
        return finite & (eig < 0.0)

    feas = jax.vmap(feasible)(gammas)
    idx = jnp.argmax(feas)   # smallest feasible gamma (grid is ascending)
    return jnp.where(jnp.any(feas), gammas[idx], jnp.inf)


def mu_synthesis(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, *,
                 n_dk_iters: int = 4,
                 uncertainty_scale: float = 0.3) -> MuSynthesisResult:
    """D-K-lite iteration.

    K-step: H-inf state feedback on the D-scaled plant.  D-step: diagonal
    scales from the closed-loop output magnitudes (the diagonal-mu upper
    bound refinement).  Returns the final gain and the achieved
    scaled-norm bound (an upper bound on mu against diagonal structured
    uncertainty of the given scale).
    """
    n = a.shape[0]
    d = jnp.ones(c.shape[0])
    k = jnp.zeros((b.shape[1], n))
    gamma = jnp.inf

    for _ in range(n_dk_iters):
        c_scaled = d[:, None] * c
        # K-step: LQR on the D-scaled plant (CARE with S = BB').
        x = solve_care_ode(a, b @ b.T, c_scaled.T @ c_scaled,
                           n_steps=2000, dt=2e-3)
        k = b.T @ x
        a_cl = a - b @ k
        gamma = _hinf_norm_bound(a_cl, b * uncertainty_scale, c_scaled)
        # D-step: rebalance scales by closed-loop output-channel gains
        # (observability Gramian diagonal, Perron-like rebalancing).
        gram = solve_care_ode(a_cl, jnp.zeros_like(a), c.T @ c,
                              n_steps=2000, dt=2e-3)
        chan = jnp.sqrt(jnp.maximum(jnp.diag(c @ gram @ c.T), 1e-9))
        d = jnp.sqrt(d * jnp.mean(chan) / jnp.maximum(chan, 1e-9))

    mu_ub = gamma * uncertainty_scale
    return MuSynthesisResult(k_gain=k, d_scales=d, mu_upper_bound=mu_ub,
                             gamma=gamma,
                             converged=jnp.isfinite(gamma))


# ---------------------------------------------------------------------------
# RWM feedback
# ---------------------------------------------------------------------------

class RWMPlant(NamedTuple):
    """2-state RWM model: mode amplitude + wall flux (reference
    ``rwm_feedback.py`` reduced plant)."""

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray


def build_rwm_plant(*, gamma_rwm: float = 50.0, tau_wall_s: float = 5e-3,
                    coupling: float = 30.0) -> RWMPlant:
    """Unstable mode (growth rate gamma_rwm without feedback) coupled to a
    resistive wall with time constant tau_wall."""
    a = jnp.asarray([[gamma_rwm, coupling],
                     [0.0, -1.0 / tau_wall_s]])
    b = jnp.asarray([[0.0], [1.0 / tau_wall_s]])
    c = jnp.asarray([[1.0, 0.0]])
    return RWMPlant(a=a, b=b, c=c)


class RWMFeedbackResult(NamedTuple):
    k_gain: jnp.ndarray
    closed_loop_rate: jnp.ndarray   # max Re(eig) — negative = stabilised
    stabilised: jnp.ndarray
    trace: jnp.ndarray              # mode-amplitude history


def rwm_feedback_design(plant: RWMPlant, *, q_weight: float = 100.0,
                        r_weight: float = 1.0, dt: float = 1e-4,
                        n_steps: int = 3000) -> RWMFeedbackResult:
    """LQR-type magnetic feedback through the wall actuator + closed-loop
    simulation from a finite seed perturbation."""
    n = plant.a.shape[0]
    q = q_weight * jnp.eye(n)
    # CARE: A'X + XA - X (B R^-1 B') X + Q = 0
    x = solve_care_ode(plant.a, plant.b @ plant.b.T / r_weight, q,
                       n_steps=4000, dt=1e-4)
    k = (plant.b.T @ x) / r_weight
    a_cl = plant.a - plant.b @ k
    rate = jnp.max(jnp.real(jnp.linalg.eigvals(a_cl)))

    def step(s, _):
        s1 = s + dt * (a_cl @ s)
        return s1, s1[0]

    s0 = jnp.asarray([1e-3, 0.0])
    _, amp = jax.lax.scan(step, s0, None, length=n_steps)
    return RWMFeedbackResult(k_gain=k, closed_loop_rate=rate,
                             stabilised=rate < 0.0, trace=amp)
