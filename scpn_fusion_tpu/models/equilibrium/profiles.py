"""Pressure / current profile shapes for the GS source term.

JAX re-implementation of the reference's profile semantics
(``fusion_kernel.py:359-444``): L-mode linear profiles and H-mode mtanh
pedestal profiles evaluated on normalised flux, plus the composite
``J_phi = beta_mix * R p' + (1 - beta_mix) * FF' / (mu0 R)`` source with
renormalisation to the target plasma current.  Everything is traceable and
differentiable — profile parameters arrive as a traced array so ``jax.grad``
can flow through pedestal shape into the equilibrium.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from scpn_fusion_tpu.core.config import PhysicsParams


class ProfileCoeffs(NamedTuple):
    """Traced mtanh profile parameters (one instance per p'/FF' channel)."""

    ped_top: jnp.ndarray
    ped_width: jnp.ndarray
    ped_height: jnp.ndarray
    core_alpha: jnp.ndarray

    @classmethod
    def from_config(cls, p, dtype=jnp.float32) -> "ProfileCoeffs":
        return cls(
            ped_top=jnp.asarray(p.ped_top, dtype),
            ped_width=jnp.asarray(p.ped_width, dtype),
            ped_height=jnp.asarray(p.ped_height, dtype),
            core_alpha=jnp.asarray(p.core_alpha, dtype),
        )


def mtanh_profile(psi_norm: jnp.ndarray, p: ProfileCoeffs) -> jnp.ndarray:
    """Modified-tanh pedestal profile; zero outside 0 <= psi_norm < 1."""
    inside = (psi_norm >= 0.0) & (psi_norm < 1.0)
    y = jnp.clip((p.ped_top - psi_norm) / p.ped_width, -20.0, 20.0)
    pedestal = 0.5 * p.ped_height * (1.0 + jnp.tanh(y))
    core = jnp.where(
        psi_norm < p.ped_top,
        jnp.maximum(0.0, 1.0 - (psi_norm / p.ped_top) ** 2),
        0.0,
    )
    return jnp.where(inside, pedestal + p.core_alpha * core, 0.0)


def lmode_profile(psi_norm: jnp.ndarray) -> jnp.ndarray:
    """Linear L-mode profile ``1 - psi_norm`` inside the plasma, else zero."""
    inside = (psi_norm >= 0.0) & (psi_norm < 1.0)
    return jnp.where(inside, 1.0 - psi_norm, 0.0)


def plasma_current_density(
    psi: jnp.ndarray,
    psi_axis: jnp.ndarray,
    psi_boundary: jnp.ndarray,
    rr: jnp.ndarray,
    *,
    h_mode: bool,
    p_coeffs: ProfileCoeffs,
    ff_coeffs: ProfileCoeffs,
    mu0: float,
    i_target: jnp.ndarray,
    d_r: float,
    d_z: float,
    beta_mix: float = 0.5,
) -> jnp.ndarray:
    """Toroidal current density from the GS source profiles, Ip-renormalised.

    Mirrors ``update_plasma_source_nonlinear`` (``fusion_kernel.py:394-444``).
    ``h_mode`` is static (selects the profile family at trace time).
    """
    denom = psi_boundary - psi_axis
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    psi_norm = (psi - psi_axis) / denom

    if h_mode:
        p_profile = mtanh_profile(psi_norm, p_coeffs)
        ff_profile = mtanh_profile(psi_norm, ff_coeffs)
    else:
        p_profile = lmode_profile(psi_norm)
        ff_profile = p_profile

    j_p = rr * p_profile
    j_f = ff_profile / (mu0 * rr)
    j_raw = beta_mix * j_p + (1.0 - beta_mix) * j_f

    i_current = jnp.sum(j_raw) * d_r * d_z
    scale = jnp.where(jnp.abs(i_current) > 1e-9, i_target / i_current, 0.0)
    return j_raw * scale


def profile_coeffs_from_physics(phys: PhysicsParams, dtype=jnp.float32):
    """Extract (p', FF') mtanh coefficient pytrees from a static config."""
    return (
        ProfileCoeffs.from_config(phys.p_prime, dtype),
        ProfileCoeffs.from_config(phys.ff_prime, dtype),
    )
