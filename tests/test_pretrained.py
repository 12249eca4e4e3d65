"""Pretrained surrogate artifacts: train/load/checksum/accuracy."""

import json

import numpy as np
import pytest

from scpn_fusion_tpu.models.surrogates.pretrained import (
    WEIGHTS_DIR,
    _teacher_fluxes,
    load_transport_surrogate,
    train_transport_surrogate,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    out = tmp_path_factory.mktemp("weights")
    metrics = train_transport_surrogate(n_train=10_000, n_test=1000,
                                        n_steps=3000, out_dir=out)
    return out, metrics


class TestArtifact:
    def test_training_meets_reference_accuracy(self, artifact):
        _, metrics = artifact
        # reference lane: QLKNN surrogate test rel-L2 0.0943 (RESULTS.md)
        assert metrics["test_rel_l2"] < 0.0943

    def test_load_and_predict(self, artifact):
        out, metrics = artifact
        predict, loaded = load_transport_surrogate(weights_dir=out)
        assert loaded["sha256"] == metrics["sha256"]
        rng = np.random.default_rng(1)
        x = np.stack([rng.uniform(2, 10, 50), rng.uniform(2, 10, 50),
                      rng.uniform(0, 5, 50), rng.uniform(1, 4, 50),
                      rng.uniform(0, 2, 50), rng.uniform(0.5, 2, 50),
                      rng.uniform(0.05, 0.8, 50)], axis=1)
        pred = np.asarray(predict(x))
        truth = _teacher_fluxes(x)
        rel = np.linalg.norm(pred - truth) / np.linalg.norm(truth)
        assert rel < 0.15
        assert np.all(pred >= 0.0)   # physical contract: clamped fluxes

    def test_tampered_npz_refused(self, artifact):
        out, _ = artifact
        npz = out / "neural_transport.npz"
        data = npz.read_bytes()
        npz.write_bytes(data + b"corrupt")
        try:
            with pytest.raises(RuntimeError, match="checksum mismatch"):
                load_transport_surrogate(weights_dir=out)
        finally:
            npz.write_bytes(data)

    def test_committed_repo_artifact_loads(self):
        if not (WEIGHTS_DIR / "neural_transport.npz").exists():
            pytest.skip("no committed artifact in this checkout")
        predict, metrics = load_transport_surrogate()
        assert metrics["test_rel_l2"] < 0.0943
        out = np.asarray(predict(np.asarray(
            [[8.0, 6.0, 2.0, 2.0, 1.0, 1.0, 0.1]])))
        assert out.shape == (1, 3)
        assert np.all(np.isfinite(out))
