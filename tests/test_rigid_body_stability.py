"""n=0 rigid-body stability analyzer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.rigid_body_stability import (
    MU0,
    analyze_rigid_body,
    ring_forces,
    stability_landscape,
    vacuum_field_at,
)


def _make_grid(dtype=np.float64):
    return Grid(NR=129, NZ=129, R_min=3.0, R_max=9.0,
                Z_min=-3.0, Z_max=3.0, dtype=np.dtype(dtype))


def _psi_decay_index(grid, b0=-0.4, r0=6.0, n=0.7, alpha=0.0):
    """Psi with Bz = b0 (R/r0)^-n at Z=0 plus optional Z^2 well."""
    rr, zz = grid.RR, grid.ZZ
    psi = b0 * r0**n * rr ** (2.0 - n) / (2.0 - n) + alpha * rr**2 * zz**2
    return jnp.asarray(psi)


def test_vacuum_field_and_decay_index_recovery():
    grid = _make_grid()
    psi = _psi_decay_index(grid, b0=-0.4, r0=6.0, n=0.7)
    bz, br, n_idx = vacuum_field_at(psi, grid, 6.0, 0.0)
    assert float(bz) == pytest.approx(-0.4, rel=1e-3)
    assert float(br) == pytest.approx(0.0, abs=1e-8)
    assert float(n_idx) == pytest.approx(0.7, rel=2e-2)


def test_hoop_force_formula():
    grid = _make_grid()
    psi = jnp.zeros(grid.shape, jnp.float64)  # no vacuum field
    f = ring_forces(psi, grid, 6.0, 0.0, 15.0, beta_p=0.5, li=0.8)
    ip_a = 15.0e6
    a = 6.0 / 3.0
    term = np.log(8 * 6.0 / a) + 0.5 + 0.4 - 1.5
    expect = float(MU0) * ip_a**2 / 2.0 * term / 6.0
    assert float(f.f_hoop_n) == pytest.approx(expect, rel=1e-6)
    assert float(f.f_lorentz_r_n) == pytest.approx(0.0, abs=1e-3)


def test_vertical_stiffness_matches_analytic():
    """Psi += alpha R^2 Z^2 gives F_Z = 4 pi alpha Ip R^2 Z, so
    K_ZZ = -dF_Z/dZ = -4 pi alpha Ip R^2 exactly."""
    grid = _make_grid()
    alpha = 0.01
    psi = _psi_decay_index(grid, alpha=alpha)
    rep = analyze_rigid_body(psi, grid, r_target=6.0, z_target=0.0,
                             ip_ma=15.0)
    ip_a = 15.0e6
    k_zz_expect = -4.0 * np.pi * alpha * ip_a * 6.0**2
    assert float(rep.stiffness_n_m[1, 1]) == pytest.approx(
        k_zz_expect, rel=2e-2)
    # alpha > 0 with positive Ip destabilises: K_ZZ < 0 -> unstable.
    assert not bool(rep.vertical_stable)
    neg = analyze_rigid_body(_psi_decay_index(grid, alpha=-alpha), grid,
                             r_target=6.0, z_target=0.0, ip_ma=15.0)
    assert bool(neg.vertical_stable)


def test_field_index_window_flag():
    grid = _make_grid()
    ok = analyze_rigid_body(_psi_decay_index(grid, n=0.7), grid,
                            r_target=6.0, z_target=0.0, ip_ma=15.0)
    assert bool(ok.n_index_ok)
    bad = analyze_rigid_body(_psi_decay_index(grid, n=1.9), grid,
                             r_target=6.0, z_target=0.0, ip_ma=15.0)
    assert not bool(bad.n_index_ok)


def test_report_jits_and_eig_consistent():
    grid = _make_grid()
    psi = _psi_decay_index(grid, alpha=0.005)
    f = jax.jit(lambda p: analyze_rigid_body(
        p, grid, r_target=6.0, z_target=0.0, ip_ma=15.0))
    rep = f(psi)
    k = np.asarray(rep.stiffness_n_m)
    ev = np.sort(np.asarray(rep.eigenvalues).real)
    expect = np.sort(np.linalg.eigvals(k).real)
    np.testing.assert_allclose(ev, expect, rtol=1e-8)


def test_stability_landscape_shape_and_center():
    grid = _make_grid()
    psi = _psi_decay_index(grid)
    r_pts = jnp.linspace(5.0, 7.0, 9)
    z_pts = jnp.linspace(-1.0, 1.0, 7)
    f_r, f_z = stability_landscape(psi, grid, r_points=r_pts,
                                   z_points=z_pts, ip_ma=15.0)
    assert f_r.shape == (7, 9) and f_z.shape == (7, 9)
    centre = ring_forces(psi, grid, 6.0, 0.0, 15.0)
    assert float(f_r[3, 4]) == pytest.approx(float(centre.f_r_n), rel=1e-6)
