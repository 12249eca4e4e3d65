"""JAX-safe special functions for toroidal Green's functions.

Complete elliptic integrals K(m) and E(m) via Abramowitz & Stegun polynomial
approximations (17.3.34 / 17.3.36, |error| < 2e-8) — fully traceable and
differentiable, no scipy on the device path.  The reference uses the same
technique in its JAX lane (``core/jax_equilibrium_solver.py:50-129``) while its
NumPy lane calls ``scipy.special.ellipk/ellipe`` (``fusion_kernel.py:218-251``).

Argument convention: ``m = k**2`` (the *parameter*), matching
``scipy.special.ellipk(m)``.
"""

from __future__ import annotations

import jax.numpy as jnp

# A&S 17.3.34 — K(m) = P(m1) - Q(m1) ln(m1), m1 = 1 - m
_K_P = (1.38629436112, 0.09666344259, 0.03590092383, 0.03742563713, 0.01451196212)
_K_Q = (0.5, 0.12498593597, 0.06880248576, 0.03328355346, 0.00441787012)
# A&S 17.3.36 — E(m) = P(m1) - Q(m1) ln(m1)
_E_P = (1.0, 0.44325141463, 0.06260601220, 0.04757383546, 0.01736506451)
_E_Q = (0.0, 0.24998368310, 0.09200180037, 0.04069697526, 0.00526449639)

_M1_FLOOR = 1e-12


def _poly4(c, x):
    # Horner evaluation of c0 + c1 x + c2 x^2 + c3 x^3 + c4 x^4
    return c[0] + x * (c[1] + x * (c[2] + x * (c[3] + x * c[4])))


def ellipk(m: jnp.ndarray) -> jnp.ndarray:
    """Complete elliptic integral of the first kind, K(m), m = k^2 in [0, 1)."""
    m1 = jnp.clip(1.0 - m, _M1_FLOOR, 1.0)
    return _poly4(_K_P, m1) - _poly4(_K_Q, m1) * jnp.log(m1)


def ellipe(m: jnp.ndarray) -> jnp.ndarray:
    """Complete elliptic integral of the second kind, E(m), m = k^2 in [0, 1]."""
    m1 = jnp.clip(1.0 - m, _M1_FLOOR, 1.0)
    return _poly4(_E_P, m1) - _poly4(_E_Q, m1) * jnp.log(m1)


def green_coil_psi(
    r_src: jnp.ndarray,
    z_src: jnp.ndarray,
    r_obs: jnp.ndarray,
    z_obs: jnp.ndarray,
    mu0: float,
) -> jnp.ndarray:
    """Axisymmetric circular-filament poloidal-flux Green's function.

    psi per ampere-turn linking a filament at (r_src, z_src) to observation
    points (r_obs, z_obs).  Semantics follow the reference's
    ``green_function`` (``fusion_kernel_free_boundary.py:31-55``): the
    singular self-observation limit is regularised to zero (this helper is
    for external coil-to-grid coupling, not self-inductance).

    All inputs broadcast; fully traceable under jit/vmap/grad.
    """
    dz = z_obs - z_src
    denom = (r_obs + r_src) ** 2 + dz**2
    k2 = 4.0 * r_obs * r_src / jnp.maximum(denom, 1e-30)
    k2 = jnp.clip(k2, 1e-12, 1.0 - 1e-12)
    k = jnp.sqrt(k2)
    K = ellipk(k2)
    E = ellipe(k2)
    prefactor = mu0 / (2.0 * jnp.pi) * jnp.sqrt(jnp.maximum(r_obs * r_src, 0.0))
    psi = prefactor * ((2.0 - k2) * K - 2.0 * E) / k
    self_mask = (r_obs - r_src) ** 2 + dz**2 < 1e-24
    return jnp.where(self_mask, 0.0, psi)
