"""VMEC-lite spectral 3D equilibrium tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.equilibrium.vmec_lite import (
    SpectralBasis,
    flux_surface_rz,
    solve_vmec_lite,
    tokamak_boundary,
)


@pytest.fixture
def setup():
    basis = SpectralBasis(m_pol=3, n_tor=2, n_fp=1)
    r_b, z_b = tokamak_boundary(6.2, 2.0, 1.7, 0.33, basis)
    n_s = 21
    s = np.linspace(0, 1, n_s)
    pressure = jnp.asarray(1e5 * (1 - s**2))
    iota = jnp.asarray(0.9 - 0.5 * s**2)
    return basis, r_b, z_b, pressure, iota


def test_basis_layout():
    basis = SpectralBasis(m_pol=2, n_tor=1)
    # m=0: n in [0, 1]; m=1,2: n in [-1, 1] -> 2 + 3 + 3 modes.
    assert basis.n_modes == 8
    assert basis.mode_index(0, 0) == 0


def test_basis_evaluate_roundtrip():
    basis = SpectralBasis(m_pol=2, n_tor=0)
    theta = jnp.linspace(0, 2 * np.pi, 64)
    zeta = jnp.zeros_like(theta)
    coeffs = jnp.zeros(basis.n_modes).at[basis.mode_index(1, 0)].set(2.0)
    vals = basis.evaluate(coeffs, theta, zeta)
    np.testing.assert_allclose(np.asarray(vals), 2.0 * np.cos(np.asarray(theta)),
                               atol=1e-6)


def test_solve_converges_and_preserves_boundary(setup):
    basis, r_b, z_b, pressure, iota = setup
    res = solve_vmec_lite(basis, r_b, z_b, pressure, iota,
                          n_s=21, max_iter=3000, tol=1e-3)
    assert bool(res.converged), f"residual {float(res.residual)}"
    # Boundary row held exactly.
    np.testing.assert_array_equal(np.asarray(res.r_mn[-1]), np.asarray(r_b))
    np.testing.assert_array_equal(np.asarray(res.z_mn[-1]), np.asarray(z_b))
    assert np.all(np.isfinite(np.asarray(res.r_mn)))


def test_flux_surfaces_nested(setup):
    basis, r_b, z_b, pressure, iota = setup
    res = solve_vmec_lite(basis, r_b, z_b, pressure, iota, max_iter=3000,
                          tol=1e-3)
    r_mid, z_mid = flux_surface_rz(basis, res, 10)
    r_edge, z_edge = flux_surface_rz(basis, res, 20)
    # Mid surface strictly inside the edge surface (minor-radius proxy).
    a_mid = float(jnp.max(r_mid) - jnp.min(r_mid))
    a_edge = float(jnp.max(r_edge) - jnp.min(r_edge))
    assert 0 < a_mid < a_edge
    # Elongation of the edge surface reflects kappa.
    elong = float((jnp.max(z_edge) - jnp.min(z_edge))
                  / (jnp.max(r_edge) - jnp.min(r_edge)))
    np.testing.assert_allclose(elong, 1.7, rtol=0.15)


def test_differentiable_wrt_boundary(setup):
    basis, r_b, z_b, pressure, iota = setup

    def axis_radius(r_bound):
        res = solve_vmec_lite(basis, r_bound, z_b, pressure, iota,
                              max_iter=50, tol=1e-6, differentiable=True)
        return res.r_mn[0, basis.mode_index(0, 0)]

    g = jax.grad(axis_radius)(r_b)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # Axis major radius follows the boundary (0,0) mode.
    assert g[basis.mode_index(0, 0)] > 0.5
