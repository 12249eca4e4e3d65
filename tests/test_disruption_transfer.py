"""Cross-generator disruption transfer: loader + scoring contracts.

Reference parity: ``validation/validate_real_shots.py:549-705`` (shot
evaluator over the committed DIII-D-like fixtures) and
``benchmark_disruption_transfer_generalization.py`` (held-out-generator
evaluation).  The full train+eval run lives in
``validation/run_disruption_transfer.py``; these tests pin the
deterministic pieces — manifest-verified loading, the reference's own
split, per-shot baseline referencing, and the persistent-alarm score.
"""

import numpy as np
import pytest

from scpn_fusion_tpu.control.disruption_transfer import (
    BASELINE_TICKS,
    PERSISTENCE,
    REFERENCE_SHOT_DIR,
    ReferenceShotsUnavailable,
    _persistent_score,
    _robust_scaler,
    _subtract_shot_baseline,
    _to_cohort,
    load_reference_shots,
    load_reference_splits,
)

has_reference = REFERENCE_SHOT_DIR.is_dir()
needs_reference = pytest.mark.skipif(
    not has_reference, reason="read-only reference tree not mounted")


@needs_reference
def test_manifest_verified_load():
    shots, disagreements = load_reference_shots()
    assert len(shots) == 16
    assert sum(1 for s in shots if s.is_disruption) == 6
    # Five scenario-labelled hard negatives: manifest says disruptive,
    # embedded truth flag says safe (quench-free elevated-MHD traces).
    assert len(disagreements) == 5
    for s in shots:
        assert s.signals.shape[1] == 10          # time column dropped
        assert np.all(np.isfinite(s.signals))
        if s.is_disruption:
            assert 0 < s.disruption_idx < s.signals.shape[0]


@needs_reference
def test_reference_split_is_partition():
    shots, _ = load_reference_shots()
    splits = load_reference_splits()
    assert not (splits["train"] & splits["val"])
    assert not (splits["train"] & splits["test"])
    assert not (splits["val"] & splits["test"])
    all_split = splits["train"] | splits["val"] | splits["test"]
    assert {s.shot_number for s in shots} == all_split
    # The VDE scenario must be held out (unseen-scenario transfer).
    vde = [s.shot_number for s in shots if "vde" in s.name]
    assert vde and all(n not in splits["train"] for n in vde)


@needs_reference
def test_cohort_shapes_and_supervision_windows():
    shots, _ = load_reference_shots()
    sigs, labels, onsets, pos_end = _to_cohort(shots[:4])
    n, t_len, c = sigs.shape
    assert (n, c) == (4, 10)
    for i in range(n):
        if labels[i] > 0.5:
            assert 0 <= onsets[i] < pos_end[i] <= t_len
        else:
            assert onsets[i] == -1 and pos_end[i] == t_len


def test_baseline_subtraction_kills_level_offsets():
    """A constant-elevated channel (the hard-negative signature) must
    vanish; a trend away from the shot's own baseline must survive."""
    rng = np.random.default_rng(0)
    t_len = 4 * BASELINE_TICKS
    flat = np.full((1, t_len, 2), 5.0) + rng.normal(0, 0.01, (1, t_len, 2))
    trend = flat.copy()
    trend[0, 2 * BASELINE_TICKS:, 1] += np.linspace(0.0, 3.0,
                                                    2 * BASELINE_TICKS)
    out_flat = _subtract_shot_baseline(flat.astype(np.float32))
    out_trend = _subtract_shot_baseline(trend.astype(np.float32))
    assert np.abs(out_flat).max() < 0.1
    assert out_trend[0, -1, 1] > 2.5
    assert np.abs(out_trend[0, :BASELINE_TICKS]).max() < 0.1


def test_robust_scaler_resists_quench_spikes():
    """IQR scale must track the precursor band, not a 200x quench spike."""
    rng = np.random.default_rng(1)
    x = rng.normal(0.0, 1.0, (2, 400, 1)).astype(np.float32)
    x[0, -5:, 0] = 200.0
    scale = _robust_scaler(x)
    assert 0.5 < float(scale[0]) < 3.0


def test_persistent_score_requires_consecutive_ticks():
    risk = np.zeros(64, dtype=np.float32)
    risk[10:10 + PERSISTENCE - 1] = 0.9          # one tick short: no alarm
    assert _persistent_score(risk, settle=0).max() == 0.0
    risk[10:10 + PERSISTENCE] = 0.9              # exactly p ticks: alarm
    score = _persistent_score(risk, settle=0)
    assert score.max() == pytest.approx(0.9)
    assert int(np.argmax(score > 0.5)) == 10


def test_missing_tree_raises_blocked_signal(tmp_path):
    with pytest.raises(ReferenceShotsUnavailable):
        load_reference_shots(shot_dir=tmp_path / "absent",
                             manifest_path=tmp_path / "absent.json")
    with pytest.raises(ReferenceShotsUnavailable):
        load_reference_splits(splits_path=tmp_path / "absent.json")
