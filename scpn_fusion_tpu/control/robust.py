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
# Structured uncertainty + block-diagonal mu upper bound
# ---------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class UncertaintyBlock:
    """One structured uncertainty block (reference ``mu_synthesis.py:23-29``)."""

    name: str
    size: int
    bound: float
    block_type: str = "complex_scalar"   # real_scalar | complex_scalar | full

    def __post_init__(self) -> None:
        if self.size < 1:
            raise ValueError("uncertainty block size must be >= 1")
        import math
        if self.bound < 0.0 or not math.isfinite(self.bound):
            raise ValueError("block bound must be finite and non-negative")
        if self.block_type not in ("real_scalar", "complex_scalar", "full"):
            raise ValueError(f"unsupported block type {self.block_type!r}")


@dataclasses.dataclass(frozen=True)
class StructuredUncertainty:
    """Validated block structure (hashable: jit-static)."""

    blocks: tuple[UncertaintyBlock, ...]

    def __post_init__(self) -> None:
        if not self.blocks:
            raise ValueError("need at least one uncertainty block")

    @property
    def total_size(self) -> int:
        return sum(b.size for b in self.blocks)

    def block_index(self) -> jnp.ndarray:
        """(n,) int: which block each channel belongs to."""
        idx = []
        for i, b in enumerate(self.blocks):
            idx.extend([i] * b.size)
        return jnp.asarray(idx, jnp.int32)


def mu_upper_bound(m: jnp.ndarray,
                   structure: StructuredUncertainty | None = None,
                   *, n_steps: int = 80, lr: float = 0.2) -> jnp.ndarray:
    """Structured-singular-value upper bound min_D sigma_max(D M D^-1).

    D is block-diagonal positive (constant within each uncertainty
    block); the minimisation runs gradient descent on log d with EXACT
    autodiff gradients of sigma_max (the reference perturbs each scale
    numerically, ``mu_synthesis.py:99-110``).  With no structure the
    bound is the unstructured spectral norm.
    """
    m = jnp.asarray(m)
    if m.ndim != 2 or m.shape[0] != m.shape[1]:
        raise ValueError("M must be square")
    if structure is None:
        return jnp.linalg.norm(m, 2)
    if structure.total_size != m.shape[0]:
        raise ValueError("Delta structure size must match M")
    idx = structure.block_index()
    n_blocks = len(structure.blocks)

    def sigma_of(log_d):
        d_chan = jnp.exp(log_d)[idx]
        m_scaled = d_chan[:, None] * m / d_chan[None, :]
        return jnp.linalg.norm(m_scaled, 2)

    grad_fn = jax.grad(sigma_of)

    def body(carry, _):
        log_d, best = carry
        g = grad_fn(log_d)
        log_d = log_d - lr * g
        log_d = log_d - log_d[0]        # gauge: D M D^-1 scale-invariant
        best = jnp.minimum(best, sigma_of(log_d))
        return (log_d, best), None

    log_d0 = jnp.zeros((n_blocks,), m.dtype if m.dtype in
                       (jnp.float32, jnp.float64) else jnp.float32)
    (_, best), _ = jax.lax.scan(
        body, (log_d0, sigma_of(log_d0)), None, length=n_steps)
    return best


def dk_iteration_structured(
    a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
    structure: StructuredUncertainty,
    *, n_dk_iters: int = 4,
) -> MuSynthesisResult:
    """D-K iteration against a declared block structure.

    K-step: LQR on the D-scaled plant (as :func:`mu_synthesis`);
    D/mu-step: the block-structured :func:`mu_upper_bound` of the closed
    loop, scaled by the worst block bound — the robustness margin is
    ``1 / mu`` (reference ``MuSynthesisController.robustness_margin``).
    """
    if structure.total_size != a.shape[0]:
        raise ValueError("uncertainty structure must match the plant size")
    max_bound = max(blk.bound for blk in structure.blocks)
    n = a.shape[0]
    d = jnp.ones(c.shape[0])
    k = jnp.zeros((b.shape[1], n))
    mu_best = jnp.asarray(jnp.inf)

    for _ in range(n_dk_iters):
        c_scaled = d[:, None] * c
        x = solve_care_ode(a, b @ b.T, c_scaled.T @ c_scaled,
                           n_steps=2000, dt=2e-3)
        k_cand = b.T @ x
        a_cl = a - b @ k_cand
        mu = mu_upper_bound(a_cl, structure) * (1.0 + max_bound)
        better = mu < mu_best
        mu_best = jnp.where(better, mu, mu_best)
        k = jnp.where(better, k_cand, k)
        gram = solve_care_ode(a_cl, jnp.zeros_like(a), c.T @ c,
                              n_steps=2000, dt=2e-3)
        chan = jnp.sqrt(jnp.maximum(jnp.diag(c @ gram @ c.T), 1e-9))
        d = jnp.sqrt(d * jnp.mean(chan) / jnp.maximum(chan, 1e-9))

    return MuSynthesisResult(k_gain=k, d_scales=d,
                             mu_upper_bound=mu_best,
                             gamma=mu_best / (1.0 + max_bound),
                             converged=jnp.isfinite(mu_best))


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
