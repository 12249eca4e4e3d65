"""Multi-regime FNO training-pair generator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.surrogates.fno_multi_regime import (
    REGIME_NAMES,
    SPARC_REGIMES,
    generate_multi_regime_pairs,
    sample_regime_params,
    train_fno_multi_regime,
)


def test_param_sampling_respects_regime_boxes():
    idx = jnp.asarray([0, 1, 2, 0, 2] * 20)
    params = sample_regime_params(jax.random.PRNGKey(0), idx)
    for i, regime in enumerate(REGIME_NAMES):
        mask = np.asarray(idx) == i
        for k in ("alpha", "kappa", "nu", "damp", "k_cut"):
            lo, hi = SPARC_REGIMES[regime][k]
            vals = np.asarray(params[k])[mask]
            assert vals.min() >= lo - 1e-6 and vals.max() <= hi + 1e-6, (
                regime, k)


def test_pairs_shapes_and_determinism():
    x, y, idx = generate_multi_regime_pairs(jax.random.PRNGKey(1),
                                            n_samples=16, grid_size=32)
    assert x.shape == (16, 32, 32) and y.shape == (16, 32, 32)
    assert idx.shape == (16,)
    assert np.all(np.isfinite(np.asarray(x)))
    x2, y2, _ = generate_multi_regime_pairs(jax.random.PRNGKey(1),
                                            n_samples=16, grid_size=32)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_regime_probability_weighting():
    _, _, idx = generate_multi_regime_pairs(jax.random.PRNGKey(2),
                                            n_samples=512, grid_size=8,
                                            regime_probs=(1.0, 0.0, 0.0))
    assert np.all(np.asarray(idx) == 0)


def test_one_step_operator_is_learnable():
    """A small FNO reaches useful accuracy on the one-step operator."""
    _, val_rel_l2, _ = train_fno_multi_regime(
        jax.random.PRNGKey(3), n_samples=128, grid_size=32,
        modes=8, width=16, n_steps=400)
    assert val_rel_l2 < 0.5, val_rel_l2


def test_evolution_respects_spectral_cutoff():
    """Output fields carry no energy far above the regime k_cut."""
    x, y, _ = generate_multi_regime_pairs(jax.random.PRNGKey(4),
                                          n_samples=8, grid_size=64)
    yk = np.fft.fft2(np.asarray(y))
    k1 = np.fft.fftfreq(64) * 64
    kx, ky = np.meshgrid(k1, k1)
    k2 = kx**2 + ky**2
    far = k2 > 30.0**2  # above every regime's k_cut (max 20)
    frac = (np.abs(yk[:, far]) ** 2).sum() / (np.abs(yk) ** 2).sum()
    assert frac < 1e-3, frac
