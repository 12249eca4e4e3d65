"""Federated disruption training: FedAvg/FedProx rounds, DP, learning."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.federated import (
    FederatedConfig,
    dp_clip_and_noise,
    generate_disruption_data,
    predict_disruption_risk,
    train_federated,
)

FAST = dict(n_samples=128, local_epochs=2, n_rounds=6, batch_size=32)


class TestData:
    def test_disruptive_shots_separate(self):
        x, y = generate_disruption_data("diiid", 400, 0.3, seed=0)
        x, y = np.asarray(x), np.asarray(y)
        # locked-mode amplitude (col 0) higher for disruptive class
        assert x[y > 0.5, 0].mean() > 2.0 * x[y < 0.5, 0].mean()
        # q95 (col 2) lower
        assert x[y > 0.5, 2].mean() < x[y < 0.5, 2].mean()
        assert y.mean() == pytest.approx(0.3, abs=0.01)

    def test_unknown_machine_rejected(self):
        with pytest.raises(ValueError, match="unknown machine"):
            generate_disruption_data("nstx", 10, 0.3, seed=0)


class TestDP:
    def test_clip_bounds_update_norm(self):
        import jax
        update = {"w": jnp.full((8, 8), 10.0), "b": jnp.full((8,), 10.0)}
        out = dp_clip_and_noise(update, max_norm=1.0, sigma=0.0,
                                key=jax.random.PRNGKey(0))
        total = np.sqrt(sum(np.sum(np.asarray(g) ** 2)
                            for g in jax.tree.leaves(out)))
        assert total <= 1.0 + 1e-5

    def test_small_update_not_rescaled(self):
        import jax
        update = {"w": jnp.full((4,), 1e-3)}
        out = dp_clip_and_noise(update, max_norm=1.0, sigma=0.0,
                                key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out["w"]), 1e-3, rtol=1e-6)


class TestFederation:
    def test_fedavg_learns(self):
        cfg = FederatedConfig(**FAST, dp_enabled=False)
        params, trace = train_federated(cfg, seed=0)
        assert trace.global_loss.shape == (6,)
        assert float(trace.global_loss[-1]) < float(trace.global_loss[0])
        assert float(trace.accuracy[-1]) > 0.85

    def test_trained_model_ranks_disruptive_higher(self):
        cfg = FederatedConfig(**FAST, dp_enabled=False)
        params, _ = train_federated(cfg, seed=1)
        x, y = generate_disruption_data("jet", 200, 0.3, seed=99)
        risk = np.asarray(predict_disruption_risk(params, x))
        y = np.asarray(y)
        assert risk[y > 0.5].mean() > risk[y < 0.5].mean() + 0.2

    def test_fedprox_runs_and_learns(self):
        cfg = FederatedConfig(**FAST, aggregation="fedprox",
                              dp_enabled=False)
        _, trace = train_federated(cfg, seed=2)
        assert float(trace.global_loss[-1]) < float(trace.global_loss[0])

    def test_dp_noise_still_learns(self):
        cfg = FederatedConfig(**FAST, dp_enabled=True,
                              dp_noise_sigma=1e-4)
        _, trace = train_federated(cfg, seed=3)
        assert float(trace.accuracy[-1]) > 0.8

    def test_config_validation(self):
        with pytest.raises(ValueError):
            FederatedConfig(machines=())
        with pytest.raises(ValueError):
            FederatedConfig(disruption_fraction=1.5)
        with pytest.raises(ValueError):
            FederatedConfig(aggregation="gossip")
