"""Global reactor design scan + compact-reactor optimisation on device.

Role-parity with the reference's design exploration lane
(``core/global_design_scanner.py`` parameter sweeps over (R0, B0, Ip, ...)
and ``core/compact_reactor_optimizer.py`` constrained compact-device
search): every design point evaluates the same 0D physics chain —

    IPB98(y,2) confinement -> 0D burn equilibrium -> Q, P_fus
    Greenwald / beta / q* operational limits
    net-electric balance (models/engineering.plant_performance)

— so the whole scan is a ``vmap`` over the design grid: 10^4-10^5 design
points evaluate in one device launch instead of a Python loop.  The
optimiser is the scan plus a feasibility mask + argmax (robust and global
over the sampled space, and differentiable for local refinement).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.models.engineering.balance_of_plant import (
    PlantParams,
    plant_performance,
)
from scpn_fusion_tpu.models.physics.scaling_burn import burn_equilibrium_0d

MU0 = 4.0e-7 * jnp.pi


@dataclasses.dataclass(frozen=True)
class DesignLimits:
    greenwald_fraction_max: float = 0.9
    beta_n_max: float = 2.8
    q_star_min: float = 2.0
    b_max_coil_t: float = 23.0     # peak field at the HTS coil
    p_wall_max_mw_m2: float = 4.0  # neutron wall load


class DesignPoint(NamedTuple):
    """One evaluated reactor design (all arrays broadcast together)."""

    r_m: jnp.ndarray
    a_m: jnp.ndarray
    b0_t: jnp.ndarray
    ip_ma: jnp.ndarray
    ne19: jnp.ndarray
    p_aux_mw: jnp.ndarray
    kappa: jnp.ndarray
    q_fusion: jnp.ndarray
    p_fusion_mw: jnp.ndarray
    p_net_mw: jnp.ndarray
    t_kev: jnp.ndarray
    greenwald_fraction: jnp.ndarray
    beta_n: jnp.ndarray
    q_star: jnp.ndarray
    wall_load_mw_m2: jnp.ndarray
    b_coil_t: jnp.ndarray
    feasible: jnp.ndarray


def evaluate_design(r_m, a_m, b0_t, ip_ma, ne19, p_aux_mw, kappa=1.8,
                    limits: DesignLimits = DesignLimits(),
                    plant: PlantParams = PlantParams()) -> DesignPoint:
    """0D chain for one design point (fully traceable -> vmap/grad)."""
    burn = burn_equilibrium_0d(ne19=ne19, p_aux_mw=p_aux_mw, ip_ma=ip_ma,
                               bt_t=b0_t, r_m=r_m, a_m=a_m, kappa=kappa)

    n_gw = ip_ma / (jnp.pi * a_m ** 2)                 # 1e20 m^-3
    f_gw = ne19 / (10.0 * jnp.maximum(n_gw, 1e-6))

    # Volume-average beta from the burn temperature
    volume = 2.0 * jnp.pi ** 2 * r_m * a_m ** 2 * kappa
    pressure_pa = 2.0 * ne19 * 1e19 * burn.t_kev * 1.602e-16
    beta = 2.0 * MU0 * pressure_pa / (b0_t ** 2)
    beta_pct = 100.0 * beta
    beta_n = beta_pct * a_m * b0_t / jnp.maximum(ip_ma, 1e-6)

    eps = a_m / r_m
    q_star = (5.0 * a_m ** 2 * b0_t / (r_m * jnp.maximum(ip_ma, 1e-6))
              * 0.5 * (1.0 + kappa ** 2))

    wall_area = 4.0 * jnp.pi ** 2 * r_m * a_m * jnp.sqrt(
        0.5 * (1.0 + kappa ** 2))
    wall_load = 0.8 * burn.p_fusion_mw / jnp.maximum(wall_area, 1e-6)

    # Peak coil field: B0 scaled to the inboard coil leg
    b_coil = b0_t * r_m / jnp.maximum(r_m - a_m - 0.8, 0.1)

    perf = plant_performance(burn.p_fusion_mw, p_aux_mw, plant)

    feasible = ((f_gw < limits.greenwald_fraction_max)
                & (beta_n < limits.beta_n_max)
                & (q_star > limits.q_star_min)
                & (b_coil < limits.b_max_coil_t)
                & (wall_load < limits.p_wall_max_mw_m2)
                & burn.converged)
    return DesignPoint(
        r_m=jnp.asarray(r_m), a_m=jnp.asarray(a_m), b0_t=jnp.asarray(b0_t),
        ip_ma=jnp.asarray(ip_ma), ne19=jnp.asarray(ne19),
        p_aux_mw=jnp.asarray(p_aux_mw), kappa=jnp.asarray(kappa),
        q_fusion=burn.q_fusion, p_fusion_mw=burn.p_fusion_mw,
        p_net_mw=perf.p_net_mw, t_kev=burn.t_kev,
        greenwald_fraction=f_gw, beta_n=beta_n, q_star=q_star,
        wall_load_mw_m2=wall_load, b_coil_t=b_coil, feasible=feasible)


class ScanResult(NamedTuple):
    points: DesignPoint
    best_index: jnp.ndarray
    n_feasible: jnp.ndarray


def scan_designs(*, r_m, a_m, b0_t, ip_ma, ne19, p_aux_mw, kappa=1.8,
                 objective: str = "q_fusion",
                 limits: DesignLimits = DesignLimits()) -> ScanResult:
    """vmap the 0D chain over flat design arrays; pick the feasible best.

    All inputs broadcast to a common 1D length; `objective` is a
    DesignPoint field name maximised over the feasible set.
    """
    args = jnp.broadcast_arrays(
        jnp.atleast_1d(jnp.asarray(r_m, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(a_m, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(b0_t, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(ip_ma, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(ne19, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(p_aux_mw, jnp.float32)),
        jnp.atleast_1d(jnp.asarray(kappa, jnp.float32)))
    points = jax.vmap(
        lambda r, a, b, i, n, p, k: evaluate_design(
            r, a, b, i, n, p, k, limits=limits))(*args)
    score = getattr(points, objective)
    masked = jnp.where(points.feasible, score, -jnp.inf)
    return ScanResult(points=points, best_index=jnp.argmax(masked),
                      n_feasible=jnp.sum(points.feasible))


def compact_reactor_search(*, n_samples: int = 4096, seed: int = 0,
                           p_aux_mw: float = 50.0,
                           limits: DesignLimits = DesignLimits()
                           ) -> ScanResult:
    """Random-search compact-device optimiser (reference
    ``compact_reactor_optimizer`` role): minimise R0 subject to Q >= 10 and
    all operational limits, via one vmapped scan."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    r = jax.random.uniform(ks[0], (n_samples,), minval=1.5, maxval=7.0)
    eps = jax.random.uniform(ks[1], (n_samples,), minval=0.25, maxval=0.36)
    b = jax.random.uniform(ks[2], (n_samples,), minval=4.0, maxval=14.0)
    ipn = jax.random.uniform(ks[3], (n_samples,), minval=0.3, maxval=1.0)
    a = eps * r
    # Ip from a safe q* target band
    ip = ipn * 5.0 * a ** 2 * b / r
    ne = 0.8 * 10.0 * ip / (jnp.pi * a ** 2)   # 80% Greenwald
    res = scan_designs(r_m=r, a_m=a, b0_t=b, ip_ma=ip, ne19=ne,
                       p_aux_mw=jnp.full((n_samples,), p_aux_mw),
                       objective="q_fusion", limits=limits)
    # Re-rank: smallest R0 among feasible Q >= 10 designs
    pts = res.points
    ok = pts.feasible & (pts.q_fusion >= 10.0)
    size_score = jnp.where(ok, -pts.r_m, -jnp.inf)
    return ScanResult(points=pts, best_index=jnp.argmax(size_score),
                      n_feasible=jnp.sum(ok))
