"""ELM cycle model: peeling-ballooning trigger, crash, power-balance frequency.

JAX port of the reference's ELM machinery (``core/elm_model.py:27-160``):
the peeling limit j_edge < j_crit(n_mode, q95, shaping), the ballooning
limit alpha < alpha_crit(s), the type-I crash releasing a fraction of the
pedestal stored energy, and the power-balance ELM frequency
``f_ELM = P_SOL / (f_loss W_ped)``.  Composes with
``models/physics/stability_mhd.peeling_ballooning_stability`` and the
pedestal model for cycle simulations under ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def ballooning_limit(s_edge):
    """Connor-Hastie-Taylor alpha_crit(s) (shared with stability_mhd)."""
    s = jnp.maximum(s_edge, 0.0)
    return jnp.maximum(jnp.where(s < 1.0, s * (1.0 - s / 2.0), 0.6 * s), 0.0)


def peeling_limit(j_edge_norm, q95, kappa, delta, n_mode: int = 10):
    """Normalised peeling threshold: shaping raises it, high n lowers it."""
    f_shape = (1.0 + 0.5 * (kappa - 1.0)) * (1.0 + 0.8 * delta)
    return f_shape * (1.0 + 2.0 / jnp.maximum(n_mode, 1)) / jnp.maximum(q95, 1.0)


def pb_unstable(alpha_edge, j_edge_norm, s_edge, q95, kappa, delta):
    """Elliptical coupled peeling-ballooning boundary crossing."""
    a_crit = jnp.maximum(ballooning_limit(s_edge), 1e-3)
    j_crit = jnp.maximum(peeling_limit(j_edge_norm, q95, kappa, delta), 1e-3)
    radius = jnp.sqrt((alpha_edge / a_crit) ** 2 + (j_edge_norm / j_crit) ** 2)
    return radius > 1.0


class ELMCrash(NamedTuple):
    delta_w_mj: jnp.ndarray
    t_ped_after_kev: jnp.ndarray
    n_ped_after_1e19: jnp.ndarray


def elm_crash(t_ped_kev, n_ped_1e19, w_ped_mj, *, loss_fraction=0.3,
              conductive_share=0.7) -> ELMCrash:
    """Type-I crash: lose ``loss_fraction`` of W_ped, split conductive
    (temperature) / convective (density) by ``conductive_share``."""
    delta_w = loss_fraction * w_ped_mj
    t_after = t_ped_kev * (1.0 - loss_fraction * conductive_share)
    n_after = n_ped_1e19 * (1.0 - loss_fraction * (1.0 - conductive_share))
    return ELMCrash(delta_w, t_after, n_after)


def elm_power_balance_frequency(p_sol_mw, w_ped_mj, f_elm_fraction):
    """f_ELM = P_SOL / (f W_ped) [Hz] (zero on degenerate inputs)."""
    ok = (w_ped_mj > 0) & (f_elm_fraction > 0)
    return jnp.where(ok, p_sol_mw / jnp.maximum(
        f_elm_fraction * w_ped_mj, 1e-12), 0.0)


class ELMCycleTrace(NamedTuple):
    t_ped: jnp.ndarray       # (n_steps,)
    crashed: jnp.ndarray     # (n_steps,) bool
    n_crashes: jnp.ndarray


def run_elm_cycle(
    *,
    t_ped0_kev,
    n_ped_1e19,
    w_ped_mj,
    heat_rate_kev_s,
    alpha_per_kev,
    s_edge,
    j_edge_norm,
    q95=3.5,
    kappa=1.7,
    delta=0.33,
    dt=1e-3,
    n_steps: int = 2000,
    loss_fraction=0.3,
):
    """Pedestal build-up / crash limit cycle under ``lax.scan``:
    heating raises T_ped (and alpha ~ alpha_per_kev * T_ped) until the PB
    boundary trips, then the crash resets the pedestal."""
    def step(t_ped, _):
        t_ped = t_ped + dt * heat_rate_kev_s
        alpha = alpha_per_kev * t_ped
        fire = pb_unstable(alpha, j_edge_norm, s_edge, q95, kappa, delta)
        crash = elm_crash(t_ped, n_ped_1e19, w_ped_mj,
                          loss_fraction=loss_fraction)
        t_next = jnp.where(fire, crash.t_ped_after_kev, t_ped)
        return t_next, {"t_ped": t_next, "crashed": fire}

    _, trace = jax.lax.scan(step, jnp.asarray(t_ped0_kev), None,
                            length=n_steps)
    return ELMCycleTrace(trace["t_ped"], trace["crashed"],
                         jnp.sum(trace["crashed"]))
