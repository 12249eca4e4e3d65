"""QLKNN-class neural-turbulence pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.surrogates.qlknn import (
    analytic_targets,
    electron_collisionality_star,
    fluxes_from_profiles,
    generate_parameter_scan,
    predict_fluxes,
    qlknn_features_from_profiles,
    train_qlknn,
)


def test_collisionality_scalings():
    """nu* ~ ne / Te^2 (v_the Te^-0.5 and nu_ee Te^-1.5)."""
    base = float(electron_collisionality_star(5.0, 1.0, 2.0, 6.2, 0.2))
    assert base > 0
    double_n = float(electron_collisionality_star(10.0, 1.0, 2.0, 6.2, 0.2))
    assert double_n == pytest.approx(2.0 * base, rel=1e-6)
    double_t = float(electron_collisionality_star(5.0, 2.0, 2.0, 6.2, 0.2))
    assert double_t == pytest.approx(base / 4.0, rel=1e-6)
    with pytest.raises(ValueError, match="R0"):
        electron_collisionality_star(5.0, 1.0, 2.0, -1.0, 0.2)


def test_feature_normalizer_known_gradients():
    """Exponential profiles give exactly known R/L values."""
    r = jnp.linspace(0.2, 2.0, 101)
    r0, a, b0 = 6.2, 2.0, 5.3
    l_t = 0.8
    te = 3.0 * jnp.exp(-r / l_t)
    q = 1.0 + 2.0 * (r / a) ** 2
    ne = 5.0 * jnp.ones_like(r)
    feats = qlknn_features_from_profiles(te, te, ne, q, r, r0=r0, a=a, b0=b0)
    assert feats.shape == (101, 10)
    # R/L_Ti = R0/l_t for an exponential profile (interior points).
    np.testing.assert_allclose(np.asarray(feats[5:-5, 0]), r0 / l_t, rtol=5e-3)
    # Flat density: R/L_ne ~ 0.
    np.testing.assert_allclose(np.asarray(feats[5:-5, 2]), 0.0, atol=1e-6)
    # Ti/Te = 1, Z_eff = 1.5, eps = r/R0.
    np.testing.assert_allclose(np.asarray(feats[:, 6]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(feats[:, 9]),
                               np.asarray(r) / r0, rtol=1e-6)
    with pytest.raises(ValueError, match="same shape"):
        qlknn_features_from_profiles(te[:-1], te, ne, q, r, r0=r0, a=a, b0=b0)


def test_analytic_targets_critical_gradient():
    """Below the Jenko threshold: zero ITG flux; above: (dR)^1.5 growth."""
    x = np.zeros((3, 10))
    x[:, 3] = 2.0          # q
    x[:, 4] = 1.0          # s_hat
    x[:, 6] = 1.0          # Ti/Te
    x[:, 9] = 0.1          # eps
    crit = (1.0 + 1.0) * max(1.33 + 1.91 * 1.0 / 2.0, 0.0) * (1.0 - 0.15)
    x[0, 0] = crit - 0.5
    x[1, 0] = crit + 1.0
    x[2, 0] = crit + 2.0
    y = np.asarray(analytic_targets(jnp.asarray(x)))
    assert y[0, 0] == 0.0
    assert y[1, 0] == pytest.approx(5.0 * 1.0**1.5, rel=1e-5)
    assert y[2, 0] == pytest.approx(5.0 * 2.0**1.5, rel=1e-5)


def test_tem_collisionality_damping():
    x = np.zeros((2, 10))
    x[:, 2] = 6.0          # R/L_ne above the 2.0 TEM threshold
    x[:, 3] = 2.0
    x[0, 7] = 0.0
    x[1, 7] = 3.0          # strong collisionality damps TEM
    y = np.asarray(analytic_targets(jnp.asarray(x)))
    assert y[0, 1] > y[1, 1] > 0.0
    assert y[0, 2] == pytest.approx(y[0, 1] / 2.0, rel=1e-6)


def test_parameter_scan_bounds():
    x = np.asarray(generate_parameter_scan(jax.random.PRNGKey(0), 512))
    assert x.shape == (512, 10)
    assert x[:, 0].min() >= 0.0 and x[:, 0].max() <= 15.0
    assert x[:, 3].min() >= 0.5 and x[:, 9].max() <= 0.3


def test_train_and_predict_quality():
    """The distilled MLP reproduces the analytic closure on held-out data."""
    model = train_qlknn(jax.random.PRNGKey(1), n_samples=4096,
                        hidden=(48, 48), n_steps=1500)
    x_test = generate_parameter_scan(jax.random.PRNGKey(2), 1024)
    y_true = np.asarray(analytic_targets(x_test))
    y_pred = np.asarray(predict_fluxes(model, x_test))
    assert np.all(y_pred >= 0.0)
    rel = (np.sqrt(np.mean((y_pred - y_true) ** 2))
           / max(np.sqrt(np.mean(y_true**2)), 1e-9))
    assert rel < 0.25, rel


def test_profiles_to_fluxes_end_to_end():
    model = train_qlknn(jax.random.PRNGKey(3), n_samples=2048,
                        hidden=(32, 32), n_steps=800)
    r = jnp.linspace(0.2, 2.0, 33)
    te = 3.0 * jnp.exp(-r / 0.6)
    q = 1.0 + 2.0 * (r / 2.0) ** 2
    ne = 5.0 * (1.0 - (r / 2.2) ** 2)
    fluxes = fluxes_from_profiles(model, te, te, ne, q, r,
                                  r0=6.2, a=2.0, b0=5.3)
    assert fluxes.shape == (33, 3)
    assert np.all(np.isfinite(np.asarray(fluxes)))
