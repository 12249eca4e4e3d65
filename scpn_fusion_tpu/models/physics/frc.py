"""Field-reversed-configuration rigid-rotor 1D equilibrium.

JAX port of the reference's rigid-rotor closure family
(``core/frc_rigid_rotor*.py``; Steinhauer, Phys. Plasmas 18, 070501 (2011)):

    B_z(r) = -B_e tanh(K u),      u = 2 r^2 / r_s^2 - 1,
    p(r)   = (B_e^2 / 2 mu0) sech^2(K u),
    n(r)   = n_m sech^2(K u),
    J_theta = -(1/mu0) dB_z/dr,
    psi(r) = int_0^r B_z r' dr'   (log-cosh closed form),

which satisfies radial force balance d/dr (p + B_z^2/2mu0) = 0 exactly
(p + B^2/2mu0 = B_e^2/2mu0 everywhere).  The field null sits at
R_null = r_s / sqrt(2).  The returned state is the input contract of the
pulsed Hall-MHD carrier (``models/physics/hall_mhd_pulsed.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from scpn_fusion_tpu.core.dtypes import canonical, default_float

MU0 = 4.0e-7 * jnp.pi


class FRCEquilibriumState(NamedTuple):
    rho: jnp.ndarray        # radial grid [m]
    psi: jnp.ndarray        # poloidal-flux-per-radian analogue [Wb]
    b_z: jnp.ndarray        # axial field [T]
    pressure: jnp.ndarray   # [Pa]
    density: jnp.ndarray    # [m^-3]
    j_theta: jnp.ndarray    # azimuthal current density [A/m^2]
    r_null: jnp.ndarray     # field-null radius [m]
    r_s: jnp.ndarray        # separatrix radius [m]
    force_balance_residual: jnp.ndarray  # max |d(p + B^2/2mu0)/dr| / scale


def solve_rigid_rotor(
    *,
    b_external_t: float,
    separatrix_radius_m: float,
    sharpness_k: float = 1.0,
    peak_density_m3: float = 1e20,
    n_points: int = 256,
    wall_radius_factor: float = 1.4,
    dtype=None,
) -> FRCEquilibriumState:
    """Solve the rigid-rotor FRC equilibrium on a uniform radial grid."""
    dtype = default_float() if dtype is None else canonical(dtype)
    if separatrix_radius_m <= 0 or b_external_t <= 0 or sharpness_k <= 0:
        raise ValueError("b_external_t, separatrix_radius_m, sharpness_k must be > 0")
    r_s = jnp.asarray(separatrix_radius_m, dtype)
    b_e = jnp.asarray(b_external_t, dtype)
    k = jnp.asarray(sharpness_k, dtype)

    rho = jnp.linspace(0.0, wall_radius_factor * separatrix_radius_m,
                       n_points, dtype=dtype)
    u = 2.0 * rho**2 / r_s**2 - 1.0
    b_z = -b_e * jnp.tanh(k * u)
    p = (b_e**2 / (2.0 * MU0)) * (1.0 - jnp.tanh(k * u) ** 2)
    n = peak_density_m3 * (1.0 - jnp.tanh(k * u) ** 2)

    # psi(r) = int_0^r B_z r' dr' ; with du = 4 r dr / r_s^2:
    # psi = -(B_e r_s^2 / 4K) [ln cosh(K u) - ln cosh(-K)]
    log_cosh = lambda x: jnp.abs(x) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(x))) - jnp.log(2.0)  # noqa: E731
    psi = -(b_e * r_s**2 / (4.0 * k)) * (log_cosh(k * u) - log_cosh(-k))

    # J_theta = -(1/mu0) dB_z/dr = (B_e K / mu0) sech^2(K u) * 4 r / r_s^2.
    sech2 = 1.0 - jnp.tanh(k * u) ** 2
    j_theta = (b_e * k / MU0) * sech2 * 4.0 * rho / r_s**2

    # Force-balance audit: d/dr (p + B^2/2mu0) should vanish.
    total = p + b_z**2 / (2.0 * MU0)
    d_total = jnp.abs(jnp.diff(total)) / (rho[1] - rho[0])
    scale = b_e**2 / (2.0 * MU0 * separatrix_radius_m)
    residual = jnp.max(d_total) / scale

    return FRCEquilibriumState(
        rho=rho, psi=psi, b_z=b_z, pressure=p, density=n, j_theta=j_theta,
        r_null=r_s / jnp.sqrt(2.0), r_s=r_s,
        force_balance_residual=residual)
