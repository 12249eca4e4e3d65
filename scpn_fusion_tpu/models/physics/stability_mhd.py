"""MHD stability criteria suite (jittable, vectorised).

JAX port of the reference's stability suite (``core/stability_mhd.py:44-500``
+ ``stability_mhd_extended.py:62-390``), same reduced-order formulas:

* q-profile from a parabolic current profile with Uckan-style shape
  corrections, magnetic shear, normalised pressure gradient alpha_MHD
* Mercier/Suydam interchange proxy  D_M = s^2/4 - alpha  (stable >= 0)
* first ballooning boundary (Connor-Hastie-Taylor 1978):
  alpha_crit = s(1 - s/2) for s < 1, 0.6 s otherwise
* Kruskal-Shafranov external kink: q_edge > 1
* Troyon beta_N limit (g = 2.8 no-wall / 3.5 ideal-wall)
* reduced Rutherford NTM seeding: w_marg = -(j_bs/j) a / (r_s Delta')
* resistive wall mode: gamma tau_w ~ (beta_N - g_nw)/(g_w - beta_N)
* peeling-ballooning elliptical boundary (Snyder 2002/2011 calibration)

All criteria are pure jnp functions: they run inside scenario scans and are
differentiable for stability-aware design optimisation (which the
reference's NumPy implementation cannot do).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

MU0 = 4.0e-7 * jnp.pi
E_KEV_J = 1.602176634e-16


class QProfile(NamedTuple):
    rho: jnp.ndarray
    q: jnp.ndarray
    shear: jnp.ndarray
    alpha_mhd: jnp.ndarray
    q_min: jnp.ndarray
    q_min_rho: jnp.ndarray
    q_edge: jnp.ndarray


def _gradient(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = x[1] - x[0]
    interior = (y[2:] - y[:-2]) / (2.0 * h)
    left = (y[1] - y[0]) / h
    right = (y[-1] - y[-2]) / h
    return jnp.concatenate([left[None], interior, right[None]])


def compute_q_profile(
    rho: jnp.ndarray,
    ne: jnp.ndarray,
    ti: jnp.ndarray,
    te: jnp.ndarray,
    r0: float,
    a: float,
    b0: float,
    ip_ma: float,
    kappa: float = 1.0,
    delta: float = 0.0,
) -> QProfile:
    """Shape-aware approximate safety-factor profile."""
    ip = ip_ma * 1e6
    epsilon = a / r0
    f_shape = (1.0 + kappa**2 * (1.0 + 2.0 * delta**2 - 1.2 * delta**3)) / 2.0
    f_aspect = (1.17 - 0.65 * epsilon) / (1.0 - epsilon**2)
    f_total = f_shape * f_aspect

    rho_safe = jnp.maximum(rho, 1e-10)
    i_enc = ip * (2.0 * rho_safe**2 - rho_safe**4)
    b_theta = jnp.maximum(MU0 * i_enc / (2.0 * jnp.pi * rho_safe * a), 1e-12)
    q = rho_safe * a * b0 / (r0 * b_theta) * f_total
    q0 = f_total * jnp.pi * a**2 * b0 / (MU0 * r0 * ip)
    q = q.at[0].set(q0)

    dq = _gradient(q, rho_safe)
    shear = (rho_safe / q) * dq
    shear = shear.at[0].set(0.0)

    p_pa = ne * 1e19 * (ti + te) * E_KEV_J
    dp_dr = _gradient(p_pa, rho_safe) / a
    alpha_mhd = -2.0 * MU0 * r0 * q**2 / b0**2 * dp_dr

    idx = jnp.argmin(q)
    return QProfile(rho=rho, q=q, shear=shear, alpha_mhd=alpha_mhd,
                    q_min=q[idx], q_min_rho=rho[idx], q_edge=q[-1])


class MercierResult(NamedTuple):
    rho: jnp.ndarray
    d_m: jnp.ndarray
    stable: jnp.ndarray
    all_stable: jnp.ndarray


def mercier_stability(qp: QProfile) -> MercierResult:
    """Suydam interchange proxy: D_M = s^2/4 - alpha, stable where >= 0
    (axis region, first 5 points, excluded as in the reference)."""
    d_m = qp.shear**2 / 4.0 - qp.alpha_mhd
    stable = d_m >= 0.0
    idx = jnp.arange(qp.rho.shape[0])
    checked = idx >= 5
    return MercierResult(qp.rho, d_m, stable,
                         jnp.all(jnp.where(checked, stable, True)))


class BallooningResult(NamedTuple):
    rho: jnp.ndarray
    s: jnp.ndarray
    alpha: jnp.ndarray
    alpha_crit: jnp.ndarray
    stable: jnp.ndarray
    margin: jnp.ndarray


def ballooning_stability(qp: QProfile) -> BallooningResult:
    """First ballooning boundary (Connor-Hastie-Taylor 1978)."""
    s, alpha = qp.shear, qp.alpha_mhd
    alpha_crit = jnp.maximum(
        jnp.where(s < 1.0, s * (1.0 - s / 2.0), 0.6 * s), 0.0)
    stable = alpha <= alpha_crit
    return BallooningResult(qp.rho, s, alpha, alpha_crit, stable,
                            alpha_crit - alpha)


def ballooning_stability_eigen(
    qp: QProfile,
    *,
    alpha_max: float = 5.0,
    n_alpha: int = 64,
) -> BallooningResult:
    """Eigenvalue-based ballooning boundary WITH second-stability access.

    Replaces the closed-form Connor-Hastie-Taylor first boundary with the
    full s-alpha ballooning-equation scan (``physics/ballooning.py`` —
    reference ``ballooning_solver.py`` + ``ballooning_second_stability.py``):
    a point is stable when it sits below the first boundary OR above the
    second boundary (second-stability access, which the closed-form lane
    cannot represent — the regime real pedestals exploit).  ``alpha_crit``
    reports the first boundary (scan ceiling on full-access rows, matching
    the reference artifact convention).
    """
    from scpn_fusion_tpu.models.physics.ballooning import ballooning_stable, \
        second_stability_scan

    s, alpha = qp.shear, qp.alpha_mhd
    stable = ballooning_stable(jnp.maximum(s, 0.0), jnp.maximum(alpha, 0.0))
    scan = second_stability_scan(
        jnp.maximum(s, 0.0), alpha_max=alpha_max, n_alpha=n_alpha)
    return BallooningResult(qp.rho, s, alpha, scan.alpha_crit_first, stable,
                            scan.alpha_crit_first - alpha)


class KruskalShafranovResult(NamedTuple):
    q_edge: jnp.ndarray
    stable: jnp.ndarray
    margin: jnp.ndarray


def kruskal_shafranov_stability(qp: QProfile) -> KruskalShafranovResult:
    """External kink (m=1, n=1): stable when q_edge > 1."""
    return KruskalShafranovResult(qp.q_edge, qp.q_edge > 1.0, qp.q_edge - 1.0)


class TroyonResult(NamedTuple):
    beta_n: jnp.ndarray
    beta_n_crit_nowall: jnp.ndarray
    beta_n_crit_wall: jnp.ndarray
    stable_nowall: jnp.ndarray
    stable_wall: jnp.ndarray
    margin_nowall: jnp.ndarray


def troyon_beta_limit(beta_t, ip_ma, a, b0,
                      g_nowall: float = 2.8, g_wall: float = 3.5) -> TroyonResult:
    """Troyon normalised-beta limit: beta_N = 100 beta_t a B0 / Ip[MA]."""
    i_n = ip_ma / (a * b0)
    beta_n = 100.0 * beta_t / i_n
    g_nw = jnp.asarray(g_nowall)
    g_w = jnp.asarray(g_wall)
    return TroyonResult(beta_n, g_nw, g_w, beta_n < g_nw, beta_n < g_w,
                        g_nw - beta_n)


class NTMResult(NamedTuple):
    rho: jnp.ndarray
    delta_prime: jnp.ndarray
    j_bs_drive: jnp.ndarray
    w_marginal: jnp.ndarray
    ntm_unstable: jnp.ndarray
    most_unstable_rho: jnp.ndarray


def ntm_stability(qp: QProfile, j_bs: jnp.ndarray, j_total: jnp.ndarray,
                  a: float, r_s_delta_prime: float = -2.0) -> NTMResult:
    """Reduced modified-Rutherford NTM triggerability analysis."""
    j_total_safe = jnp.where(jnp.abs(j_total) > 1e-6, j_total, 1e-6)
    j_bs_frac = j_bs / j_total_safe
    delta_prime = jnp.full_like(qp.rho, r_s_delta_prime)
    denom = jnp.where(jnp.abs(delta_prime) > 1e-10, delta_prime, -1e-10)
    w_marg = jnp.maximum(-j_bs_frac * a / denom, 0.0)
    unstable = (w_marg > 0.0) & (j_bs_frac > 0.0) & (delta_prime < 0.0)
    idx = jnp.argmax(jnp.where(unstable, w_marg, 0.0))
    most = jnp.where(jnp.any(unstable), qp.rho[idx], jnp.nan)
    return NTMResult(qp.rho, delta_prime, j_bs_frac, w_marg, unstable, most)


class RWMResult(NamedTuple):
    beta_n: jnp.ndarray
    stable: jnp.ndarray
    mode_growth_rate: jnp.ndarray


def rwm_stability(beta_n, g_nowall: float = 2.8, g_wall: float = 3.5) -> RWMResult:
    """Resistive wall mode: grows on the wall time between the limits."""
    growth = jnp.where(
        beta_n > g_nowall,
        (beta_n - g_nowall) / jnp.maximum(g_wall - beta_n, 0.01),
        0.0)
    return RWMResult(jnp.asarray(beta_n), beta_n < g_nowall, growth)


class PeelingBallooningResult(NamedTuple):
    j_edge_norm: jnp.ndarray
    alpha_edge_norm: jnp.ndarray
    stability_distance: jnp.ndarray
    stable: jnp.ndarray
    type_i_elm: jnp.ndarray   # deep in unstable territory (pb_radius > 1.2)


def peeling_ballooning_stability(
    qp: QProfile, j_edge, p_ped_pa, r0: float, a: float, b0: float,
    kappa: float = 1.7, delta: float = 0.3) -> PeelingBallooningResult:
    """Elliptical peeling-ballooning boundary (Snyder 2002/2011)."""
    q_edge = jnp.maximum(qp.q_edge, 1.01)
    f_shape = (1.0 + 0.5 * (kappa - 1.0)) * (1.0 + 0.8 * delta)
    b_pol_denom = 2.0 * jnp.pi * a * jnp.sqrt((1.0 + kappa**2) / 2.0)
    ip_approx = 2.0 * jnp.pi * a * b0 / (MU0 * q_edge * r0)
    b_pol = MU0 * ip_approx / b_pol_denom
    j_crit = jnp.maximum(2.0 * b_pol * f_shape / (MU0 * q_edge**2 * r0), 1e-6)

    s_edge = jnp.maximum(qp.shear[-1], 0.1)
    alpha_crit_base = jnp.where(s_edge < 1.0, s_edge * (1.0 - s_edge / 2.0),
                                0.6 * s_edge)
    alpha_crit = jnp.maximum(alpha_crit_base * (1.0 + 0.3 * (kappa - 1.0)), 0.01)

    delta_ped = 0.05
    dp_dr = p_ped_pa / jnp.maximum(delta_ped * a, 1e-3)
    alpha_ped = 2.0 * MU0 * r0 * q_edge**2 / b0**2 * dp_dr

    j_norm = jnp.abs(j_edge) / j_crit
    alpha_norm = alpha_ped / alpha_crit
    pb_radius = jnp.sqrt(j_norm**2 + alpha_norm**2)
    dist = 1.0 - pb_radius
    return PeelingBallooningResult(j_norm, alpha_norm, dist, dist > 0.0,
                                   pb_radius > 1.2)


class StabilitySummary(NamedTuple):
    mercier: MercierResult
    ballooning: BallooningResult
    kruskal_shafranov: KruskalShafranovResult
    troyon: TroyonResult
    ntm: NTMResult
    rwm: RWMResult
    peeling_ballooning: PeelingBallooningResult
    overall_stable: jnp.ndarray


def run_full_stability_check(
    rho: jnp.ndarray,
    ne: jnp.ndarray,
    ti: jnp.ndarray,
    te: jnp.ndarray,
    j_bs: jnp.ndarray,
    j_total: jnp.ndarray,
    *,
    r0: float, a: float, b0: float, ip_ma: float,
    beta_t, j_edge, p_ped_pa,
    kappa: float = 1.7, delta: float = 0.3,
) -> StabilitySummary:
    """All seven criteria in one jittable pass (reference ``:434-500``)."""
    qp = compute_q_profile(rho, ne, ti, te, r0, a, b0, ip_ma, kappa, delta)
    mer = mercier_stability(qp)
    bal = ballooning_stability(qp)
    ks = kruskal_shafranov_stability(qp)
    troy = troyon_beta_limit(beta_t, ip_ma, a, b0)
    ntm = ntm_stability(qp, j_bs, j_total, a)
    rwm = rwm_stability(troy.beta_n)
    pb = peeling_ballooning_stability(qp, j_edge, p_ped_pa, r0, a, b0,
                                      kappa, delta)
    idx = jnp.arange(rho.shape[0])
    overall = (mer.all_stable
               & jnp.all(jnp.where(idx >= 5, bal.stable, True))
               & ks.stable & troy.stable_nowall & rwm.stable & pb.stable)
    return StabilitySummary(mer, bal, ks, troy, ntm, rwm, pb, overall)
