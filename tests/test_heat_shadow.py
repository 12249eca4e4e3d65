"""HEAT-ML shadow surrogate tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.surrogates.heat_shadow import (
    fit_synthetic,
    generate_shadow_dataset,
    predict_divertor_flux,
    predict_shadow_fraction,
    rmse_percent,
    synthetic_shadow_reference,
)


def test_reference_law_bounds_and_trends():
    base = np.array([[2.0, 1.3, 70.0, 10.0, 1.7, 0.3, -1.7]])
    s0 = float(synthetic_shadow_reference(base)[0])
    assert 0.03 <= s0 <= 0.82
    hi_b = base.copy(); hi_b[0, 1] = 3.5
    assert float(synthetic_shadow_reference(hi_b)[0]) > s0
    hi_p = base.copy(); hi_p[0, 2] = 170.0
    assert float(synthetic_shadow_reference(hi_p)[0]) < s0


def test_fit_recovers_reference_within_tolerance():
    w = fit_synthetic(seed=42, samples=2048)
    holdout = generate_shadow_dataset(seed=99, samples=512)
    pred = predict_shadow_fraction(w, holdout.features)
    err = rmse_percent(holdout.shadow_fraction, pred)
    assert err < 5.0, err  # compact basis captures the synthetic law


def test_predict_clipping_and_shape_checks():
    w = fit_synthetic(samples=256)
    one = predict_shadow_fraction(w, jnp.asarray(
        [2.0, 1.3, 70.0, 10.0, 1.7, 0.3, -1.7]))
    assert one.shape == (1,)
    assert 0.0 <= float(one[0]) <= 0.85
    with pytest.raises(ValueError, match="Expected shape"):
        predict_shadow_fraction(w, jnp.ones((4, 5)))


def test_flux_attenuation():
    w = fit_synthetic(samples=256)
    feats = generate_shadow_dataset(seed=3, samples=16).features
    q = predict_divertor_flux(w, 1e7, feats)
    s = predict_shadow_fraction(w, feats)
    np.testing.assert_allclose(np.asarray(q),
                               np.maximum(1e7 * (1.0 - 0.58 * np.asarray(s)),
                                          1e-6), rtol=1e-6)
    assert np.all(np.asarray(q) <= 1e7)


def test_surrogate_is_vmappable():
    w = fit_synthetic(samples=256)
    batch = generate_shadow_dataset(seed=5, samples=8).features
    per_row = jax.vmap(lambda f: predict_shadow_fraction(w, f[None, :])[0])(
        batch)
    np.testing.assert_allclose(np.asarray(per_row),
                               np.asarray(predict_shadow_fraction(w, batch)),
                               rtol=1e-6)


def test_rmse_percent_validation():
    with pytest.raises(ValueError):
        rmse_percent(np.ones(3), np.ones(4))
    assert rmse_percent(np.ones(10), np.ones(10)) == 0.0
