"""Compact differentiable bases: round-trip, gradients, policy truth table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.equilibrium.compact_basis import (
    BasisError,
    chebyshev_psi_basis,
    continuation_history_reset,
    profile_bspline_basis,
)

R = np.linspace(3.0, 9.0, 65)
Z = np.linspace(-5.0, 5.0, 65)


def test_chebyshev_roundtrip_in_span():
    basis = chebyshev_psi_basis(R, Z, n_r=8, n_z=6)
    rng = np.random.default_rng(0)
    c_true = jnp.asarray(rng.normal(size=basis.n_coeffs))
    psi = basis.synth(c_true)
    assert psi.shape == (65, 65)
    c_fit = basis.fit(psi)
    np.testing.assert_allclose(np.asarray(c_fit), np.asarray(c_true),
                               rtol=0, atol=1e-8)


def test_chebyshev_projects_smooth_field_spectrally():
    rr, zz = np.meshgrid(R, Z)
    psi = np.exp(-((rr - 6.2) ** 2 + 0.5 * zz**2) / 4.0)
    rels = []
    for n_r, n_z in [(12, 10), (16, 14), (34, 16)]:
        basis = chebyshev_psi_basis(R, Z, n_r=n_r, n_z=n_z)
        recon = np.asarray(basis.synth(basis.fit(jnp.asarray(psi))))
        rels.append(np.abs(recon - psi).max() / np.abs(psi).max())
    # contract budget (34x16) resolves a smooth field to ~1e-6, and the
    # error falls spectrally with mode count
    assert rels[2] < 1e-5
    assert rels[1] < rels[0] / 10


def test_chebyshev_synthesis_gradient_is_design():
    basis = chebyshev_psi_basis(R[:9], Z[:7], n_r=3, n_z=2)
    jac = jax.jacobian(lambda c: basis.synth(c).ravel())(
        jnp.zeros(basis.n_coeffs))
    np.testing.assert_allclose(np.asarray(jac), basis.design, atol=1e-12)


def test_chebyshev_fails_closed_underresolved():
    with pytest.raises(BasisError):
        chebyshev_psi_basis(R[:4], Z, n_r=8, n_z=4)


def test_bspline_partition_of_unity():
    psin = np.linspace(0.0, 1.0, 101)
    basis = profile_bspline_basis(psin, n_coeff=12, degree=3)
    np.testing.assert_allclose(basis.design.sum(axis=1), 1.0, atol=1e-12)
    # clamped ends: first/last coefficient owns the endpoint entirely
    assert basis.design[0, 0] == pytest.approx(1.0)
    assert basis.design[-1, -1] == pytest.approx(1.0)


def test_bspline_roundtrip_and_smoothness():
    psin = np.linspace(0.0, 1.0, 129)
    basis = profile_bspline_basis(psin, n_coeff=10)
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.normal(size=basis.n_coeffs))
    prof = basis.synth(c)
    np.testing.assert_allclose(np.asarray(basis.fit(prof)), np.asarray(c),
                               atol=1e-8)
    # cubic spline of smooth coeffs has bounded second differences
    d2 = np.diff(np.asarray(prof), n=2)
    assert np.abs(d2).max() < 0.1


def test_bspline_rejects_degenerate_coeff_count():
    with pytest.raises(BasisError):
        profile_bspline_basis(np.linspace(0, 1, 11), n_coeff=3, degree=3)


def test_fit_composes_under_jit():
    basis = profile_bspline_basis(np.linspace(0.0, 1.0, 33), n_coeff=6)
    fit = jax.jit(basis.fit)
    c = jnp.arange(6, dtype=jnp.float64 if jax.config.x64_enabled
                   else jnp.float32)
    np.testing.assert_allclose(np.asarray(fit(basis.synth(c))),
                               np.asarray(c), atol=1e-5)


def test_continuation_reset_truth_table():
    # Ip ramp of 5: reset exactly at iteration 4, never at 0
    vals = [bool(continuation_history_reset(i, ip_ramp=5)) for i in range(8)]
    assert vals == [False, False, False, False, True, False, False, False]
    # separatrix endpoint honored only when enabled
    assert bool(continuation_history_reset(
        7, ip_ramp=5, separatrix_start=4, separatrix_ramp=4,
        use_separatrix=True))
    assert not bool(continuation_history_reset(
        7, ip_ramp=5, separatrix_start=4, separatrix_ramp=4,
        use_separatrix=False))
    # degenerate ramp of 1 never resets (i>0 guard)
    assert not any(bool(continuation_history_reset(i, ip_ramp=1))
                   for i in range(4))
