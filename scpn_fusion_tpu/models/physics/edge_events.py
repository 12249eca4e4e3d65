"""Edge event models: pellet ablation/fueling, blob transport, MARFE onset.

Role-parity with the reference's edge-event modules
(``core/pellet_injection.py`` NGS ablation + fueling deposition,
``core/blob_transport.py`` interchange-blob convective transport,
``core/marfe.py`` MARFE radiative-condensation onset).  Traceable
reduced-order forms; the pellet flight integrates under ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Pellet injection (NGS ablation)
# ---------------------------------------------------------------------------

class PelletTrace(NamedTuple):
    rho: jnp.ndarray            # pellet position (normalised radius)
    radius_mm: jnp.ndarray      # remaining pellet radius
    deposition: jnp.ndarray     # d n_e / d rho (arbitrary 1e19 units)
    penetration_rho: jnp.ndarray


def pellet_ablation(*, r_pellet_mm: float = 2.0, v_pellet_m_s: float = 300.0,
                    a_m: float = 2.0, te_profile_kev: jnp.ndarray,
                    ne_profile_19: jnp.ndarray,
                    n_steps: int = 400) -> PelletTrace:
    """Neutral-gas-shielding ablation along a radial flight path.

    NGS scaling: dN/dt ~ ne^0.33 Te^1.64 r_p^1.33 (Parks-Turnbull), pellet
    launched from the edge (rho=1) flying inward; deposition is where the
    ablated inventory lands (reference ``pellet_injection.py`` contract).
    """
    n_rho = te_profile_kev.shape[0]
    rho_grid = jnp.linspace(0.0, 1.0, n_rho)
    dt = a_m / v_pellet_m_s / n_steps
    # pellet inventory ~ r^3 (molecules, arbitrary units)
    def interp(profile, rho):
        return jnp.interp(rho, rho_grid, profile)

    def step(carry, k):
        rho, r_mm = carry
        te = jnp.maximum(interp(te_profile_kev, rho), 1e-3)
        ne = jnp.maximum(interp(ne_profile_19, rho), 1e-3)
        alive = (r_mm > 0.01) & (rho > 0.0)
        dndt = 4.0 * ne ** 0.33 * te ** 1.64 * jnp.maximum(r_mm, 0.0) ** 1.33
        # dN/dt -> dr/dt via N ~ r^3: dr = dN/(3 r^2)
        drdt = -dndt / (3.0 * jnp.maximum(r_mm, 0.05) ** 2)
        r1 = jnp.where(alive, jnp.maximum(r_mm + dt * drdt * 1e3, 0.0),
                       r_mm)
        rho1 = jnp.where(alive, rho - dt * v_pellet_m_s / a_m, rho)
        ablated = jnp.where(alive, r_mm ** 3 - r1 ** 3, 0.0)
        return (rho1, r1), (rho1, r1, ablated)

    init = (jnp.asarray(1.0), jnp.asarray(r_pellet_mm))
    (_, _), (rho_tr, r_tr, abl) = jax.lax.scan(step, init,
                                               jnp.arange(n_steps))
    # bin ablated inventory onto the rho grid
    idx = jnp.clip((rho_tr * (n_rho - 1)).astype(jnp.int32), 0, n_rho - 1)
    deposition = jnp.zeros(n_rho).at[idx].add(abl)
    alive_mask = r_tr > 0.01
    pen = jnp.where(jnp.any(~alive_mask),
                    rho_tr[jnp.argmax(~alive_mask)], rho_tr[-1])
    return PelletTrace(rho=rho_tr, radius_mm=r_tr, deposition=deposition,
                       penetration_rho=pen)


# ---------------------------------------------------------------------------
# Blob transport
# ---------------------------------------------------------------------------

class BlobResult(NamedTuple):
    v_blob_m_s: jnp.ndarray
    gamma_flux_m2_s: jnp.ndarray    # particle flux carried by blobs
    e_fold_width_mm: jnp.ndarray


def blob_transport(*, blob_size_mm: float = 10.0, te_ev: float = 25.0,
                   ne19: float = 0.5, b_t: float = 2.5, r0_m: float = 1.7,
                   packing_fraction: float = 0.1,
                   l_par_m: float = 20.0) -> BlobResult:
    """Sheath-connected interchange blob velocity and convective flux.

    v_b ~ c_s (2 delta_b / R)^{1/2} in the inertial regime capped by the
    sheath-dissipation branch (reference ``blob_transport.py``).
    """
    c_s = 9.79e3 * jnp.sqrt(jnp.maximum(te_ev, 0.1))  # m/s (deuterium)
    delta = blob_size_mm * 1e-3
    v_inertial = c_s * jnp.sqrt(2.0 * delta / r0_m)
    # sheath branch: v ~ c_s (delta/R) (L_par/delta) rho_s^2/delta^2 form
    rho_s = 1.02e-4 * jnp.sqrt(jnp.maximum(te_ev, 0.1)) / jnp.maximum(
        b_t, 0.1)
    v_sheath = c_s * 2.0 * l_par_m * rho_s ** 2 / (r0_m * delta ** 2)
    v_b = jnp.minimum(v_inertial, v_sheath)
    flux = packing_fraction * ne19 * 1e19 * v_b
    # SOL e-folding width from v_b against parallel losses
    tau_par = l_par_m / c_s
    width = jnp.sqrt(v_b * delta * tau_par) * 1e3
    return BlobResult(v_blob_m_s=v_b, gamma_flux_m2_s=flux,
                      e_fold_width_mm=width)


# ---------------------------------------------------------------------------
# MARFE onset
# ---------------------------------------------------------------------------

class MARFEResult(NamedTuple):
    n_marfe_19: jnp.ndarray     # onset density
    margin: jnp.ndarray         # n_edge / n_marfe (>1 = MARFE expected)
    at_risk: jnp.ndarray


def marfe_onset(*, n_edge_19, te_edge_ev, ip_ma, a_m,
                impurity_fraction: float = 0.02,
                q95: float = 3.5) -> MARFEResult:
    """Radiative-condensation onset: the edge density above which impurity
    line radiation outruns parallel conduction (reduced Borrass-like form:
    n_MARFE ~ sqrt(j_plasma) * Te_edge^(3/4) / sqrt(f_imp q95),
    reference ``core/marfe.py`` contract)."""
    j_ma_m2 = ip_ma / (jnp.pi * a_m ** 2)
    n_marfe = (6.0 * jnp.sqrt(jnp.maximum(j_ma_m2, 1e-6))
               * jnp.maximum(te_edge_ev, 1.0) ** 0.75
               / jnp.sqrt(jnp.maximum(impurity_fraction, 1e-4) * q95)
               / 30.0)
    margin = n_edge_19 / jnp.maximum(n_marfe, 1e-9)
    return MARFEResult(n_marfe_19=n_marfe, margin=margin,
                       at_risk=margin > 1.0)
