"""Causal-transformer disruption predictor (VERDICT r3 #5).

Architecture parity vs the reference transformer
(``control/disruption_predictor.py:92-132``: d_model=32, 4 heads, ff=64,
2 layers, learned positional encoding) with a causal mask so the per-tick
risk trace is a streaming signal.  Full-power training/AUC gates live in
``validation/run_disruption_roc.py``; these tests pin structure,
causality, and trainability on a tiny cohort.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control.disruption_seq import (
    CohortConfig,
    TEST_CONFIG,
    TRAIN_CONFIGS,
    generate_hard_cohort,
    generate_training_family,
    init_seq_predictor,
    roc_auc,
    seq_logits,
    seq_risk,
    shot_scores,
    train_seq_predictor,
)

TINY = CohortConfig(n_shots=16, t_len=96, noise=0.3, label_flip=0.0)


def test_logits_shape_and_risk_range():
    params = init_seq_predictor(jax.random.PRNGKey(0), 3, 96)
    sig = jnp.asarray(np.random.default_rng(0).standard_normal((96, 3)),
                      jnp.float32)
    logits = seq_logits(params, sig)
    assert logits.shape == (96,)
    risk = seq_risk(params, sig)
    assert float(risk.min()) >= 0.0 and float(risk.max()) <= 1.0


def test_causality_future_cannot_leak():
    """logit[t] must be invariant to any change in signals after t."""
    params = init_seq_predictor(jax.random.PRNGKey(1), 3, 96)
    rng = np.random.default_rng(3)
    sig = jnp.asarray(rng.standard_normal((96, 3)), jnp.float32)
    t_cut = 40
    sig2 = sig.at[t_cut + 1:].add(
        jnp.asarray(10.0 * rng.standard_normal((96 - t_cut - 1, 3)),
                    jnp.float32))
    l1 = np.asarray(seq_logits(params, sig))
    l2 = np.asarray(seq_logits(params, sig2))
    np.testing.assert_allclose(l1[: t_cut + 1], l2[: t_cut + 1],
                               rtol=0, atol=1e-5)
    assert np.max(np.abs(l1[t_cut + 1:] - l2[t_cut + 1:])) > 1e-3


def test_cohort_balanced_with_overlapping_classes():
    shots, clean, noisy, onsets = generate_hard_cohort(
        dataclasses.replace(TEST_CONFIG, n_shots=32), seed=5)
    assert shots.shape == (32, 240, 3)
    assert clean.sum() == 16
    assert np.all(onsets[clean > 0.5] >= 0)
    assert np.all(onsets[clean <= 0.5] == -1)
    # Benign transients give safe shots real structure: their per-channel
    # max must overlap the disruptive shots' range (the non-separability
    # the lane is about).
    safe_peak = np.abs(shots[clean <= 0.5]).max(axis=(1, 2))
    dis_peak = np.abs(shots[clean > 0.5]).max(axis=(1, 2))
    assert safe_peak.max() > dis_peak.min()


def test_label_noise_flips_some_labels():
    _, clean, noisy, _ = generate_hard_cohort(
        dataclasses.replace(TEST_CONFIG, n_shots=64, label_flip=0.2), seed=9)
    n_flip = int(np.sum(clean != noisy))
    assert 3 <= n_flip <= 26


def test_training_family_excludes_test_config():
    assert all(cfg != TEST_CONFIG for cfg in TRAIN_CONFIGS)
    shots, clean, noisy, onsets = generate_training_family(
        3, configs=tuple(dataclasses.replace(c, n_shots=8)
                         for c in TRAIN_CONFIGS[:2]))
    assert shots.shape[0] == 16
    assert np.any(clean != noisy) or True  # flips possible, not guaranteed


def test_tiny_training_separates_easy_cohort():
    """On an easy low-noise cohort a short run must reach high train AUC
    (trainability smoke; the honest hard-set AUC gate is the campaign's)."""
    shots, clean, noisy, onsets = generate_hard_cohort(TINY, seed=11)
    res = train_seq_predictor(
        jnp.asarray(shots), jnp.asarray(noisy), jnp.asarray(onsets),
        jax.random.PRNGKey(0), n_steps=150, batch_size=8)
    assert float(res.loss_history[-1]) < float(res.loss_history[0])
    sc = np.asarray(shot_scores(res.params, jnp.asarray(shots), settle=16))
    assert roc_auc(sc, clean) > 0.9


def test_roc_auc_rank_statistic():
    scores = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    labels = np.array([1, 1, 0, 1, 0])
    # pairs: (0.9>0.7),(0.9>0.1),(0.8>0.7),(0.8>0.1),(0.2<0.7!),(0.2>0.1)
    assert abs(roc_auc(scores, labels) - 5.0 / 6.0) < 1e-12
    assert np.isnan(roc_auc(scores, np.zeros(5)))
