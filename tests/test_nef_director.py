"""NEF spiking channel + Director oversight layer.

Parity anchors: reference control/nengo_snn_wrapper.py:80-411 (LIF NEF
populations, decoders, low-pass channel) and
control/director_interface.py:48-279 (rule-based review, directed
mission supervising the controller, not the coils).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.director import (
    DirectorInterface,
    DirectorSnapshot,
    RuleBasedDirector,
    firing_entropy,
)
from scpn_fusion_tpu.control.nef_snn import (
    NefConfig,
    lif_init,
    lif_step,
    make_channel,
    make_lif_population,
    nef_decoder,
    nengo_available,
    run_channel,
    steady_rates,
)

CFG = NefConfig(n_neurons=80, seed=3)


class TestLIF:
    def test_nengo_honestly_absent(self):
        assert nengo_available() is False

    def test_steady_rates_bounded_by_max_rate(self):
        rng = np.random.default_rng(0)
        pop = make_lif_population(CFG, rng, jnp.float64)
        rates = steady_rates(CFG, pop, jnp.linspace(-1, 1, 50))
        assert float(jnp.max(rates)) <= CFG.max_rate_hz * 1.05
        assert float(jnp.min(rates)) >= 0.0

    def test_spiking_rate_matches_steady_rate(self):
        """Time-averaged spikes at constant input ~ analytic rate."""
        rng = np.random.default_rng(1)
        pop = make_lif_population(CFG, rng, jnp.float64)
        x = jnp.asarray(0.5, jnp.float64)
        state = lif_init(CFG, jnp.float64)
        total = jnp.zeros(CFG.n_neurons, jnp.float64)
        n_steps = 2000
        for _ in range(n_steps):
            state, rates = lif_step(CFG, pop, state, x)
            total = total + rates
        measured = np.asarray(total) / n_steps
        analytic = np.asarray(steady_rates(
            CFG, pop, jnp.asarray([0.5], jnp.float64)))[:, 0]
        active = analytic > 20.0
        assert active.sum() > 5
        np.testing.assert_allclose(measured[active], analytic[active],
                                   rtol=0.2)

    def test_decoder_reconstructs_identity(self):
        rng = np.random.default_rng(2)
        pop = make_lif_population(CFG, rng, jnp.float64)
        d = nef_decoder(CFG, pop, lambda x: x)
        x = jnp.linspace(-0.8, 0.8, 9)
        decoded = d @ steady_rates(CFG, pop, x)
        np.testing.assert_allclose(np.asarray(decoded), np.asarray(x),
                                   atol=0.1)


class TestChannel:
    def test_channel_tracks_gain(self):
        cfg = NefConfig(n_neurons=120, gain=0.8, seed=5)
        ch = make_channel(cfg, jnp.float64)
        x = jnp.full((1500,), 0.5, jnp.float64)
        out = np.asarray(run_channel(cfg, ch, x))
        # Settled output approximates gain * input through two spiking
        # stages (NEF decoding error + synaptic filtering budget).
        settled = out[-300:].mean()
        assert settled == pytest.approx(0.8 * 0.5, abs=0.1)

    def test_channel_is_causal_and_smooth(self):
        cfg = NefConfig(n_neurons=60, seed=6)
        ch = make_channel(cfg, jnp.float64)
        x = jnp.concatenate([jnp.zeros(50), jnp.ones(300)]).astype(
            jnp.float64)
        out = np.asarray(run_channel(cfg, ch, x))
        assert abs(out[:45].mean()) < 0.05      # quiet before the step
        assert out[-50:].mean() > 0.5           # responds after


class TestDirector:
    def test_rule_based_review(self):
        d = RuleBasedDirector(entropy_threshold=0.3, history_window=5)
        ok, score = d.review_action(
            DirectorSnapshot(True, 0.1, 0.01, 0), None)
        assert ok and score == pytest.approx(1 / 3)
        # High entropy pushes the rolling score over 1 -> veto.
        for _ in range(5):
            ok, _ = d.review_action(
                DirectorSnapshot(True, 0.9, 0.01, 0), None)
        assert not ok
        # Unstable plant always vetoes.
        d2 = RuleBasedDirector()
        ok, _ = d2.review_action(
            DirectorSnapshot(False, 0.0, 0.01, 0), None)
        assert not ok

    def test_validation(self):
        with pytest.raises(ValueError, match="entropy_threshold"):
            RuleBasedDirector(entropy_threshold=0.0)
        with pytest.raises(ValueError, match="history_window"):
            RuleBasedDirector(history_window=0)

    def test_firing_entropy_range(self):
        assert firing_entropy(np.zeros(8)) == 0.0
        assert firing_entropy(np.ones(8)) == pytest.approx(1.0)
        one_hot = np.zeros(8)
        one_hot[3] = 5.0
        assert firing_entropy(one_hot) == 0.0

    def test_directed_mission_blocks_chaotic_phase(self):
        """The mission freezes targets while entropy is high and resumes
        updates once the controller calms down."""
        def controller_step(targets, k):
            entropy = 0.9 if k < 4 else 0.05
            snapshot = DirectorSnapshot(True, entropy, 0.01, k)
            return snapshot, targets + 1.0

        di = DirectorInterface(controller_step,
                               entropy_threshold=0.3, history_window=2)
        final, log = di.run_directed_mission(0.0, n_periods=12)
        assert di.director_backend == "fallback_rule_based"
        approved = [bool(e["approved"]) for e in log]
        assert not any(approved[:4])       # chaotic phase vetoed
        assert any(approved[6:])           # recovery approved
        assert 0.0 < final < 12.0          # some but not all updates

    def test_injected_director_wins(self):
        class AlwaysNo:
            def review_action(self, snapshot, proposed):
                return False, 9.9

        di = DirectorInterface(
            lambda t, k: (DirectorSnapshot(True, 0.0, 0.0, k), t + 1),
            director=AlwaysNo())
        final, _ = di.run_directed_mission(0, n_periods=3)
        assert di.director_backend == "injected"
        assert final == 0
        assert di.approval_rate == 0.0
